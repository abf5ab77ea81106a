"""Multi-chip execution: crowds of characters sharded over a device mesh.

The reference is single-GPU with no distribution story (SURVEY.md section
2.3); here batching over characters is first-class and the batch axis is
sharded over ICI via ``jax.sharding.NamedSharding`` — steady-state simulation
is embarrassingly parallel across characters (model assets are replicated,
per-character state and cameras are sharded), so XLA inserts no collectives
in the hot loop; gathering the rendered frames is the only cross-chip
movement, done lazily by the caller.

The mesh uses two axes: ``data`` (characters) and ``tile`` (reserved for
intra-frame tile parallelism of very large framebuffers). The default layout
puts all devices on ``data``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .core.types import EngineConfig, ModelArrays, init_scene_state
from .step import make_step


def make_mesh(n_devices: int | None = None, tile_parallel: int = 1) -> Mesh:
    devices = np.asarray(jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    data = len(devices) // tile_parallel
    return Mesh(devices.reshape(data, tile_parallel), ("data", "tile"))


def batch_state(model: ModelArrays, batch: int):
    """Stacked initial SceneState with leading character axis."""
    single = init_scene_state(model)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape).copy(), single)


def shard_batch(tree, mesh: Mesh):
    """Place a leading-axis-batched pytree with the batch sharded on 'data'."""
    def put(x):
        spec = P("data") if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def make_batched_step(
    model: ModelArrays,
    cfg: EngineConfig,
    dims,
    mesh: Mesh,
    per_character_clips: bool = False,
    crowd_chunk: int | None = None,
):
    """jit-compiled crowd step: (states, dt, view_projs, eyes, lights, track,
    breath) -> (states', frames (B, H, W, 3)), batch sharded over 'data'.

    ``lights``/``breath`` are shared (replicated). With
    ``per_character_clips=True`` the AnimationTrack is expected stacked with
    a leading character axis (independent VMD clips, BASELINE config #5);
    otherwise one clip is shared by the whole crowd.

    ``crowd_chunk`` bounds the characters per megakernel launch: the
    batched raster tables cost ~140 MB of HBM per character at the
    flagship model's triangle count, so a 256-character crowd on one chip
    runs as lax.map over ceil(B/chunk) batched launches (e.g. chunk 32 ->
    ~4.5 GB of tables live at once) instead of one 36 GB launch.
    """
    single = make_step(model, cfg, dims)
    track_axes = 0 if per_character_clips else None

    use_fast = cfg.renderer == "tpu" or (
        cfg.renderer == "auto" and jax.default_backend() != "cpu"
    )

    if use_fast and cfg.use_megakernel and cfg.layered_shading and (
            cfg.rasterizer in ("group", "stream")):
        # Batched megakernel crowd: vmap the pure-XLA simulation over the
        # character axis and rasterize ALL local characters in ONE Pallas
        # launch (character = leading grid axis; kernels/frame_tpu.py for
        # the grouped kernel, kernels/frame_stream.py for "stream");
        # multi-chip crowds shard the batch with shard_map so each chip
        # batches its local slice.
        from jax import shard_map
        from jax.sharding import PartitionSpec as P2

        from .core.types import DiagState
        from .kernels import shade_tpu as _ST
        from .render import pipeline_tpu, shading_fast

        fast_dims = pipeline_tpu.make_dims_fast(cfg)
        packed_const = shading_fast.pack_materials(model.materials,
                                                   model.atlas)
        shade_tables = _ST.pack_shade_tables(model.materials, model.atlas)
        shade_tables = shade_tables._replace(
            atlas_flat=jnp.zeros((1, 4), jnp.uint8))
        interpret = jax.default_backend() == "cpu"

        def crowd_step(states, dt, view_projs, eyes, lights, track, breath):
            sim = jax.vmap(single.simulate,
                           in_axes=(None, 0, None, track_axes, None))
            (t, rot, trans, mw, tween_state, phys_state, contact_overflow,
             pos, nrm, uvs, mat_mod) = sim(model, states, dt, track, breath)
            packed = packed_const._replace(
                atlas_flat=model.atlas.texels.reshape(-1, 4))
            frames, pair_ofl = pipeline_tpu.render_crowd_mega(
                model, cfg, fast_dims, packed, pos, nrm, view_projs, eyes,
                lights, interpret=interpret, uvs=uvs, mat_mod=mat_mod,
                shade_tables=shade_tables, with_diag=True,
            )
            new_states = states.replace(
                time=t, local_rot=rot, local_trans=trans, morph_weights=mw,
                tween=tween_state, physics=phys_state,
                diag=DiagState(pair_overflow=pair_ofl,
                               contact_overflow=contact_overflow),
            )
            return new_states, frames

        def chunked_step(states, dt, view_projs, eyes, lights, track,
                         breath):
            b = jax.tree.leaves(states)[0].shape[0]
            if crowd_chunk is None or b <= crowd_chunk:
                return crowd_step(states, dt, view_projs, eyes, lights,
                                  track, breath)
            assert b % crowd_chunk == 0, (b, crowd_chunk)
            n = b // crowd_chunk

            def split(tree):
                return jax.tree.map(
                    lambda x: x.reshape((n, crowd_chunk) + x.shape[1:]), tree)

            def body(x):
                if per_character_clips:
                    s, vp, eye, tr = x
                else:
                    s, vp, eye = x
                    tr = track
                return crowd_step(s, dt, vp, eye, lights, tr, breath)

            xs = ((split(states), split(view_projs), split(eyes),
                   split(track)) if per_character_clips
                  else (split(states), split(view_projs), split(eyes)))
            new_states, frames = jax.lax.map(body, xs)
            unsplit = lambda t: jax.tree.map(  # noqa: E731
                lambda x: x.reshape((b,) + x.shape[2:]), t)
            return unsplit(new_states), unsplit(frames)

        def batched(states, dt, view_projs, eyes, lights, track, breath):
            if mesh.size > 1:
                tr_spec = P2("data") if per_character_clips else P2()
                mapped = shard_map(
                    chunked_step, mesh=mesh,
                    in_specs=(P2("data"), P2(), P2("data"), P2("data"),
                              P2(), tr_spec, P2()),
                    out_specs=P2("data"),
                    check_vma=False,
                )
                return mapped(states, dt, view_projs, eyes, lights, track,
                              breath)
            return chunked_step(states, dt, view_projs, eyes, lights, track,
                                breath)

        return jax.jit(batched, donate_argnums=(0,))

    if use_fast:
        # Non-stream fast paths: the grouped Pallas kernels cannot take a
        # batch grid axis; characters run as a device-side lax.map
        # (sequential per chip), sharded over chips with shard_map.
        from jax import shard_map
        from jax.sharding import PartitionSpec as P2

        def batched(states, dt, view_projs, eyes, lights, track, breath):
            def body(x):
                if per_character_clips:
                    s, vp, eye, tr = x
                else:
                    s, vp, eye = x
                    tr = track
                return single(s, dt, vp, eye, lights, tr, breath)

            xs = (
                (states, view_projs, eyes, track)
                if per_character_clips
                else (states, view_projs, eyes)
            )
            if mesh.size > 1:
                mapped = shard_map(
                    lambda local_xs: jax.lax.map(body, local_xs),
                    mesh=mesh, in_specs=P2("data"), out_specs=P2("data"),
                    check_vma=False,
                )
                return mapped(xs)
            return jax.lax.map(body, xs)

        return jax.jit(batched, donate_argnums=(0,))

    def batched(states, dt, view_projs, eyes, lights, track, breath):
        return jax.vmap(
            single, in_axes=(0, None, 0, 0, None, track_axes, None)
        )(states, dt, view_projs, eyes, lights, track, breath)

    return jax.jit(batched, donate_argnums=(0,))


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))
