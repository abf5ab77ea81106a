"""Synthetic mini-models for tests and multi-chip dry runs.

Builds a tiny but *complete* ModelArrays (bones with an append, a two-link
chain with rigid bodies + a spring joint, textured quads across all four
draw classes, one vertex morph, one IK chain) so the full engine step can be
exercised with tiny shapes and no asset files.
"""

from __future__ import annotations

import numpy as np

from .core import types as T


def make_test_model(n_bones: int = 8, j_pad: int = 8, v_pad: int = 64,
                    tex_hw: tuple[int, int] = (8, 8)) -> T.ModelArrays:
    import jax

    j = j_pad
    # chain skeleton 0->1->...->n-1, bone i at height i
    parent = np.full(j, -1, np.int32)
    bind = np.zeros((j, 3), np.float32)
    for i in range(1, n_bones):
        parent[i] = i - 1
        bind[i] = (0, 1, 0)
    abspos = np.cumsum(bind, axis=0)
    ap_parent = np.full(j, -1, np.int32)
    ap_ratio = np.zeros(j, np.float32)
    ap_rot = np.zeros(j, bool)
    if n_bones >= 4:
        ap_parent[3] = 1
        ap_ratio[3] = 0.5
        ap_rot[3] = True
    depth = np.arange(j)
    steps = max(1, int(np.ceil(np.log2(n_bones + 1))))
    skeleton = T.Skeleton(
        parent=parent, bind_trans=bind, inv_bind_trans=-abspos,
        append_parent=ap_parent, append_ratio=ap_ratio, append_rotate=ap_rot,
        append_move=np.zeros(j, bool), after_physics=np.zeros(j, bool),
        n_bones=n_bones, doubling_steps=steps,
    )

    ik = T.IKChains(
        ik_bone=np.array([n_bones - 1], np.int32),
        target=np.array([n_bones - 2], np.int32),
        loop_count=np.array([4], np.int32),
        limit_angle=np.array([1.0], np.float32),
        links=np.array([[n_bones - 3, n_bones - 4]], np.int32),
        link_has_limit=np.zeros((1, 2), bool),
        link_limit_min=np.zeros((1, 2, 3), np.float32),
        link_limit_max=np.zeros((1, 2, 3), np.float32),
        max_loops=4, n_chains=1,
    )

    # geometry: one quad per class, stacked vertically, skinned to bones
    rng = np.random.default_rng(0)
    positions = np.zeros((v_pad, 3), np.float32)
    normals = np.zeros((v_pad, 3), np.float32)
    normals[:, 2] = -1.0
    uvs = np.zeros((v_pad, 2), np.float32)
    tris = []
    tri_mat = []
    for c in range(4):
        base = c * 4
        y0 = float(c)
        quad = [(-0.5, y0, 0.0), (0.5, y0, 0.0), (0.5, y0 + 0.8, 0.0), (-0.5, y0 + 0.8, 0.0)]
        for k, p in enumerate(quad):
            positions[base + k] = p
            uvs[base + k] = (k % 2, k // 2)
        tris += [[base, base + 1, base + 2], [base, base + 2, base + 3]]
        tri_mat += [c, c]
    t = len(tris)
    t_pad = T.round_up(t, 8)
    tris_arr = np.zeros((t_pad, 3), np.int32)
    tris_arr[:t] = tris
    mat_arr = np.zeros(t_pad, np.int32)
    mat_arr[:t] = tri_mat
    # classes are already in order 0..3, each 2 tris; pad ranges
    ranges = tuple((c * 2, 2, 2) if c < 3 else (6, 2, t_pad - 6) for c in range(4))
    geometry = T.Geometry(
        positions=positions, normals=normals, uvs=uvs,
        tris=tris_arr, tri_mat=mat_arr,
        # reversed winding: on a closed mesh the inverted hull's camera-facing
        # side is culled; flat test quads need the flip to behave the same
        outline_tris=tris_arr[:, [0, 2, 1]].copy(), outline_tri_mat=mat_arr.copy(),
        n_vertices=16, class_ranges=ranges, outline_class_ranges=ranges,
    )

    joints4 = np.zeros((v_pad, 4), np.int32)
    weights4 = np.zeros((v_pad, 4), np.float32)
    joints4[:, 0] = np.minimum(np.arange(v_pad) // 4, n_bones - 1)
    weights4[:, 0] = 1.0
    dense = np.zeros((v_pad, j), np.float32)
    dense[np.arange(v_pad), joints4[:, 0]] = 1.0
    skinning = T.Skinning(
        joints=joints4, weights=weights4, weights_dense=dense,
        sdef_c=None, sdef_r0=None, sdef_r1=None, is_sdef=None,
    )

    m = 4
    lut = np.tile(np.linspace(0.5, 1.0, 256, dtype=np.float32)[None, :, None], (m, 1, 3))
    materials = T.Materials(
        alpha=np.array([1.0, 1.0, 1.0, 0.5], np.float32),
        diffuse_rgb=np.ones((m, 3), np.float32),
        edge_color=np.tile(np.array([0, 0, 0, 1], np.float32), (m, 1)),
        edge_size=np.ones(m, np.float32),
        tex_id=np.zeros(m, np.int32),
        toon_lut=lut,
        is_eye=np.array([False, True, False, False]),
        is_hair=np.array([False, False, True, False]),
        is_transparent=np.array([False, False, False, True]),
    )
    # smooth gradient texture (random noise would exaggerate the
    # nearest-vs-bilinear difference between renderer paths); tex_hw lets
    # tests use non-power-of-two sizes (odd mip strides, advisor r3)
    th, tw = tex_hw
    gy, gx = np.meshgrid(np.linspace(60, 220, th), np.linspace(40, 240, tw),
                         indexing="ij")
    texels = np.stack([gx, gy, 0.5 * (gx + gy), np.full((th, tw), 255.0)], -1)[None]
    from .core.build import build_mip_chain, build_quad_chain, build_quad_flat

    tex_u8 = texels.astype(np.uint8)
    tex_sizes = np.array([[th, tw]], np.int32)
    mip_flat, mip_base = build_mip_chain(tex_u8, tex_sizes)
    atlas = T.TextureAtlas(texels=tex_u8, sizes=tex_sizes,
                           mip_flat=mip_flat, mip_base=mip_base,
                           mip_quad=build_quad_chain(mip_flat, mip_base,
                                                     tex_sizes),
                           flat_quad=build_quad_flat(tex_u8, tex_sizes))

    morphs_off = np.zeros((2, v_pad, 3), np.float32)
    morphs_off[0, 0] = (0.0, 0.2, 0.0)
    morphs = empty_morph_tables(morphs_off, n_mats=1)

    # physics: kinematic body on bone 1, dynamic on bone 2, spring joint
    nb = 8
    nj = 8
    f3 = lambda v=0.0: np.full((nb, 3), v, np.float32)
    q0 = np.zeros((nb, 4), np.float32)
    q0[:, 3] = 1
    jq = np.zeros((nj, 4), np.float32)
    jq[:, 3] = 1
    bone_index = np.full(nb, -1, np.int32)
    bone_index[0] = 1
    bone_index[1] = 2
    is_dyn = np.zeros(nb, bool)
    is_dyn[1] = True
    physics = T.PhysicsModel(
        bone_index=bone_index, shape=np.zeros(nb, np.int32),
        size=np.full((nb, 3), 0.3, np.float32),
        mass=np.where(is_dyn, 1.0, 0.0).astype(np.float32),
        inv_mass=np.where(is_dyn, 1.0, 0.0).astype(np.float32),
        inv_inertia_local=np.full((nb, 3), 10.0, np.float32),
        linear_damping=np.full(nb, 0.1, np.float32),
        angular_damping=np.full(nb, 0.1, np.float32),
        restitution=np.zeros(nb, np.float32), friction=np.full(nb, 0.5, np.float32),
        is_dynamic=is_dyn, no_contact=np.ones(nb, bool),
        group=np.zeros(nb, np.int32), collision_mask=np.zeros(nb, np.int32),
        body_offset_pos=f3(), body_offset_quat=q0, bind_pos=f3(),
        valid=np.array([True, True] + [False] * (nb - 2)),
        joint_body_a=np.array([0] + [-1] * (nj - 1), np.int32),
        joint_body_b=np.array([1] + [-1] * (nj - 1), np.int32),
        joint_pos_a=np.zeros((nj, 3), np.float32), joint_quat_a=jq,
        joint_pos_b=np.array([[0, -1, 0]] + [[0, 0, 0]] * (nj - 1), np.float32),
        joint_quat_b=jq,
        joint_lin_min=np.zeros((nj, 3), np.float32),
        joint_lin_max=np.zeros((nj, 3), np.float32),
        joint_ang_min=np.full((nj, 3), -2.0, np.float32),
        joint_ang_max=np.full((nj, 3), 2.0, np.float32),
        joint_spring_lin=np.zeros((nj, 3), np.float32),
        joint_spring_ang=np.full((nj, 3), 5.0, np.float32),
        joint_valid=np.array([True] + [False] * (nj - 1)),
        n_bodies=2, n_joints=1,
    )

    arrays = T.ModelArrays(
        skeleton=skeleton, ik=ik, skinning=skinning, geometry=geometry,
        materials=materials, atlas=atlas, morphs=morphs, physics=physics,
    )
    return jax.device_put(arrays)


def empty_morph_tables(offsets: np.ndarray, n_mats: int) -> "T.Morphs":
    """Morphs pytree with only vertex offsets populated (test helper)."""
    nm = offsets.shape[0]
    return T.Morphs(
        offsets=offsets,
        bone_trans=np.zeros((1, 1, 3), np.float32),
        bone_rotvec=np.zeros((1, 1, 3), np.float32),
        uv_offsets=np.zeros((1, 1, 2), np.float32),
        mat_alpha_dmul=np.zeros((nm, n_mats), np.float32),
        mat_alpha_add=np.zeros((nm, n_mats), np.float32),
        mat_edge_a_dmul=np.zeros((nm, n_mats), np.float32),
        mat_edge_a_add=np.zeros((nm, n_mats), np.float32),
        n_morphs=nm,
    )
