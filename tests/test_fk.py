import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reze_tpu.core.types import Skeleton
from reze_tpu.skeleton import fk
import oracle


def make_random_skeleton(rng, n=40, with_append=True):
    parents = np.full(n, -1, np.int32)
    for i in range(1, n):
        parents[i] = rng.integers(0, i)  # topological order
    bind = rng.normal(size=(n, 3)).astype(np.float32)
    ap_parent = np.full(n, -1, np.int32)
    ap_ratio = np.zeros(n, np.float32)
    ap_rot = np.zeros(n, bool)
    ap_move = np.zeros(n, bool)
    if with_append:
        for i in range(2, n, 5):
            ap_parent[i] = rng.integers(0, n)
            ap_ratio[i] = rng.uniform(-1.5, 1.5)
            ap_rot[i] = True
            ap_move[i] = rng.random() < 0.5
    depth = np.zeros(n, np.int64)
    for i in range(1, n):
        depth[i] = depth[parents[i]] + 1
    steps = max(1, int(np.ceil(np.log2(depth.max() + 1))))
    # absolute positions from bind chain (for inverse bind)
    abspos = np.zeros((n, 3), np.float32)
    for i in range(n):
        abspos[i] = bind[i] + (abspos[parents[i]] if parents[i] >= 0 else 0)
    skel = Skeleton(
        parent=jnp.asarray(parents),
        bind_trans=jnp.asarray(bind),
        inv_bind_trans=jnp.asarray(-abspos),
        append_parent=jnp.asarray(ap_parent),
        append_ratio=jnp.asarray(ap_ratio),
        append_rotate=jnp.asarray(ap_rot),
        append_move=jnp.asarray(ap_move),
        after_physics=jnp.zeros(n, bool),
        n_bones=n,
        doubling_steps=steps,
    )
    host = dict(
        parents=parents, bind=bind, ap_parent=ap_parent, ap_ratio=ap_ratio,
        ap_rot=ap_rot, ap_move=ap_move, abspos=abspos,
    )
    return skel, host


def rand_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fk_matches_reference_oracle(seed):
    rng = np.random.default_rng(seed)
    skel, host = make_random_skeleton(rng)
    n = len(host["parents"])
    local_rot = rand_quats(rng, n)
    local_trans = rng.normal(size=(n, 3)).astype(np.float32) * 0.1

    got = np.asarray(fk.world_matrices(skel, jnp.asarray(local_rot), jnp.asarray(local_trans)))
    exp = oracle.compute_world_matrices(
        host["parents"], host["bind"], local_rot, local_trans,
        host["ap_parent"], host["ap_ratio"], host["ap_rot"], host["ap_move"],
    )
    np.testing.assert_allclose(got, exp, atol=2e-5)


def test_fk_bind_pose_identity_rotations():
    rng = np.random.default_rng(3)
    skel, host = make_random_skeleton(rng, with_append=False)
    n = len(host["parents"])
    ident = np.zeros((n, 4), np.float32)
    ident[:, 3] = 1.0
    q, p = fk.world_transforms(skel, jnp.asarray(ident), jnp.zeros((n, 3)))
    # world position in bind pose == absolute bone position
    np.testing.assert_allclose(np.asarray(p), host["abspos"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(q)[:, 3], 1.0, atol=1e-6)


def test_skin_palette_bind_pose_is_identity():
    rng = np.random.default_rng(4)
    skel, host = make_random_skeleton(rng, with_append=False)
    n = len(host["parents"])
    ident = np.zeros((n, 4), np.float32)
    ident[:, 3] = 1.0
    q, p = fk.world_transforms(skel, jnp.asarray(ident), jnp.zeros((n, 3)))
    pal = np.asarray(fk.skin_palette(skel, q, p))
    exp = np.broadcast_to(np.eye(3, 4), (n, 3, 4))
    np.testing.assert_allclose(pal, exp, atol=1e-5)


def test_fk_is_jit_and_vmap_compatible():
    rng = np.random.default_rng(5)
    skel, host = make_random_skeleton(rng)
    n = len(host["parents"])
    batch_rot = jnp.asarray(rand_quats(rng, 4 * n).reshape(4, n, 4))
    batch_trans = jnp.zeros((4, n, 3))
    f = jax.jit(jax.vmap(lambda r, t: fk.world_matrices(skel, r, t)))
    out = f(batch_rot, batch_trans)
    assert out.shape == (4, n, 4, 4)
    # each batch element must equal the unbatched result
    single = fk.world_matrices(skel, batch_rot[2], batch_trans[2])
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(single), atol=1e-6)


def test_fk_real_model(pmx_model2):
    from reze_tpu.core.build import build_skeleton

    skel = build_skeleton(pmx_model2)
    skel = jax.tree.map(jnp.asarray, skel)
    n = skel.n_bones
    j = skel.parent.shape[0]
    rng = np.random.default_rng(7)
    local_rot = np.zeros((j, 4), np.float32)
    local_rot[:, 3] = 1.0
    local_rot[:n] = rand_quats(rng, n)
    got = np.asarray(fk.world_matrices(skel, jnp.asarray(local_rot), jnp.zeros((j, 3))))[:n]

    bones = pmx_model2.bones
    parents = np.array([b.parent if 0 <= b.parent < n else -1 for b in bones])
    bind = pmx_model2.bind_translations()
    ap_parent = np.array([b.append_parent if 0 <= b.append_parent < n else -1 for b in bones])
    ap_ratio = np.array([b.append_ratio for b in bones], np.float32)
    ap_rot = np.array([b.append_rotate and 0 <= b.append_parent < n for b in bones])
    ap_move = np.array([b.append_move and 0 <= b.append_parent < n for b in bones])
    exp = oracle.compute_world_matrices(
        parents, bind, local_rot[:n], np.zeros((n, 3), np.float32),
        ap_parent, ap_ratio, ap_rot, ap_move,
    )
    np.testing.assert_allclose(got, exp, atol=5e-4)
