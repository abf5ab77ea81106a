"""The complete per-character simulate+render step as one pure function.

Factored out of :class:`reze_tpu.engine.Engine` so the same code path serves
the interactive engine (jit, donated state), crowds (vmap over characters)
and multi-chip execution (jit with NamedSharding over the character batch —
see reze_tpu/distrib.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .anim import sampler, tween
from .core import math3d as m3
from .core.types import EngineConfig, ModelArrays, SceneState
from .kernels.skinning import skin_vertices
from .physics import solver as physics_solver
from .render import pipeline
from .skeleton import fk
from .skeleton import ik as ik_mod


def make_step(model: ModelArrays, cfg: EngineConfig, dims=None,
              model_as_arg: bool = False):
    """Returns step(state, dt, view_proj, eye_pos, lights, track, breath)
    -> (state', frame (H, W, 3)).

    With ``model_as_arg`` the returned function takes the ModelArrays pytree
    as its FIRST argument instead of closing over it. Closure-captured
    arrays become jit constants, which this sandbox's device tunnel
    re-ships per dispatch (~156 MB -> seconds per frame for interactive
    per-frame calls); argument buffers stay device-resident.
    """
    use_fast = cfg.renderer == "tpu" or (
        cfg.renderer == "auto" and jax.default_backend() != "cpu"
    )
    if use_fast:
        import jax.numpy as _jnp

        from .kernels import shade_tpu as _ST
        from .render import pipeline_tpu, shading_fast

        fast_dims = pipeline_tpu.make_dims_fast(cfg)
        # small tables build host-side from the CONCRETE model; the 80 MB
        # atlas buffer is re-derived from the model argument inside the jit
        # (reshape is free) so it never becomes a closure constant
        packed_const = shading_fast.pack_materials(model.materials, model.atlas)
        shade_tables = _ST.pack_shade_tables(model.materials, model.atlas)
        shade_tables = shade_tables._replace(
            atlas_flat=_jnp.zeros((1, 4), _jnp.uint8)
        )
        interpret = jax.default_backend() == "cpu"
    if dims is None:
        dims = pipeline.make_dims(cfg)
    phys_tables = (
        physics_solver.get_tables(model.physics, cfg.physics_max_contacts)
        if cfg.enable_physics and model.physics.n_bodies > 0 else None
    )

    def simulate(model, state: SceneState, dt, track, breath):
        """Animation + FK/IK + physics + skinning (no rendering).

        -> (t, rot, trans, mw, tween_state, phys_state, contact_overflow,
            pos, nrm, uvs, mat_mod) — everything render needs plus the
        state fields to write back. Pure XLA, so crowds can jax.vmap it
        while the raster runs as ONE batched megakernel (distrib.py).
        """
        t = state.time + dt
        clip_t = t - state.play_t0

        # 1. animation sampling (device-side timeline)
        rot = state.local_rot
        trans = state.local_trans
        srot, strans = sampler.sample_bones(track, clip_t)
        use = (track.has_track & state.playing)[:, None]
        rot = jnp.where(use, srot, rot)
        trans = jnp.where(use, strans, trans)

        # 1b. breathing overlay after clip end (engine.ts:1609-1662)
        breath_t = clip_t - breath["start"]
        breathing = state.playing & (breath_t > 0.0)
        bq = sampler.breathing_rotation(
            breath["base"], breath["ranges"], jnp.maximum(breath_t, 0.0),
            breath["half_cycle"],
        )
        rot = jnp.where((breath["mask"] & breathing)[:, None], bq, rot)

        # 1c. morph weights from track when playing
        mw = jnp.where(
            state.playing, sampler.sample_morphs(track, clip_t), state.morph_weights
        )

        # 2. manual tweens override while active (rotateBones API)
        rot, tween_state = tween.apply_tweens(state.tween, rot, t)

        # 2b. bone morphs compose onto the local pose (PMX kind 2; the
        # rotation table stores log-quats so weight w scales like
        # slerp(identity, q, w))
        if model.morphs.has_bone:
            trans = trans + jnp.einsum("m,mjc->jc", mw, model.morphs.bone_trans)
            rv = jnp.einsum("m,mjc->jc", mw, model.morphs.bone_rotvec)
            rot = m3.quat_mul(rot, m3.quat_from_rotvec(rv))

        # 2c. uv morphs offset uv0 (PMX kind 3)
        uvs = None
        if model.morphs.has_uv:
            uvs = model.geometry.uvs + jnp.einsum(
                "m,mvc->vc", mw, model.morphs.uv_offsets
            )

        # 2d. material morphs -> alpha / edge-alpha factors (PMX kind 8)
        mat_mod = None
        if model.morphs.has_material:
            mat_mod = (
                1.0 + mw @ model.morphs.mat_alpha_dmul,
                mw @ model.morphs.mat_alpha_add,
                1.0 + mw @ model.morphs.mat_edge_a_dmul,
                mw @ model.morphs.mat_edge_a_add,
            )

        # 3. FK (+ CCD IK)
        if cfg.enable_ik and model.ik.n_chains > 0:
            rot = ik_mod.solve_ik(model.skeleton, model.ik, rot, trans)
        wq, wp = fk.world_transforms(model.skeleton, rot, trans)

        # 4. physics (writes world transforms of dynamic-body bones)
        phys_state = state.physics
        contact_overflow = jnp.int32(0)
        if cfg.enable_physics and model.physics.n_bodies > 0:
            wq, wp, phys_state, contact_overflow = physics_solver.step(
                cfg, model.physics, phys_state, dt, wq, wp,
                tables=phys_tables, with_diag=True,
            )

        # 5. skinning (morph blend + LBS/SDEF)
        palette = fk.skin_palette(model.skeleton, wq, wp)
        pos, nrm = skin_vertices(
            model.geometry, model.skinning, palette,
            morphs=model.morphs, morph_weights=mw, world_quat_palette=wq,
        )
        return (t, rot, trans, mw, tween_state, phys_state,
                contact_overflow, pos, nrm, uvs, mat_mod)

    def step_impl(model, state: SceneState, dt, view_proj, eye_pos, lights,
                  track, breath):
        (t, rot, trans, mw, tween_state, phys_state, contact_overflow,
         pos, nrm, uvs, mat_mod) = simulate(model, state, dt, track, breath)

        # 6. rasterize + shade + bloom
        pair_overflow = jnp.int32(0)
        if use_fast:
            packed = packed_const._replace(
                atlas_flat=model.atlas.texels.reshape(-1, 4)
            )
            render = (
                pipeline_tpu.render_frame_mega
                if cfg.use_megakernel and cfg.layered_shading
                else pipeline_tpu.render_frame_fast
            )
            frame, pair_overflow = render(
                model, cfg, fast_dims, packed, pos, nrm, view_proj, eye_pos,
                lights, interpret=interpret, uvs=uvs, mat_mod=mat_mod,
                shade_tables=shade_tables, with_diag=True,
            )
        else:
            frame = pipeline.render_frame(
                model, cfg, dims, pos, nrm, view_proj, eye_pos, lights,
                uvs=uvs, mat_mod=mat_mod,
            )

        from .core.types import DiagState

        new_state = state.replace(
            time=t,
            local_rot=rot,
            local_trans=trans,
            morph_weights=mw,
            tween=tween_state,
            physics=phys_state,
            diag=DiagState(
                pair_overflow=pair_overflow,
                contact_overflow=contact_overflow,
            ),
        )
        return new_state, frame

    if model_as_arg:
        return step_impl

    def step(state, dt, view_proj, eye_pos, lights, track, breath):
        return step_impl(model, state, dt, view_proj, eye_pos, lights, track,
                         breath)

    step.simulate = simulate  # crowds: vmap(sim) + one batched raster
    return step
