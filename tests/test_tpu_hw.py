"""Real-TPU hardware tests (VERDICT r1 item 5).

Run manually on the chip (the normal suite forces the CPU backend):

    RZ_TPU_TESTS=1 python -m pytest tests/test_tpu_hw.py -m tpu -q

Compares the compiled Pallas megakernel against the XLA reference path on
the real model ON HARDWARE — interpret-mode-only coverage misses Mosaic
compile/runtime divergences (several were hit in rounds 1-2)."""

import os

import pytest

pytestmark = pytest.mark.tpu

MODEL2 = "/root/reference/web/public/models/塞尔凯特2/塞尔凯特2.pmx"


@pytest.mark.skipif(not os.path.exists(MODEL2), reason="assets unavailable")
def test_megakernel_matches_xla_on_chip():
    import jax

    if jax.default_backend() == "cpu":
        pytest.skip("no TPU backend")
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from reze_tpu.camera import Camera
    from reze_tpu.core.build import load_model
    from reze_tpu.core.types import EngineConfig
    from reze_tpu.kernels.skinning import skin_vertices
    from reze_tpu.render import pipeline, pipeline_tpu as PT, shading_fast as SF
    from reze_tpu.skeleton import fk

    cfg = EngineConfig(width=512, height=512, camera_distance=13.5,
                       camera_target=(0.0, 17.1, 0.0), enable_bloom=False,
                       max_tris_per_bin=8192, albedo_bilinear=True,
                       albedo_half_visible=False, albedo_half_occluded=False)
    built = load_model(MODEL2, cfg)
    m = built.arrays
    skel = m.skeleton
    rot = jnp.zeros((skel.j, 4)).at[:, 3].set(1.0)
    q, p = fk.world_transforms(skel, rot, jnp.zeros((skel.j, 3)))
    pos, nrm = skin_vertices(m.geometry, m.skinning, fk.skin_palette(skel, q, p))
    cam = Camera(radius=13.5, target=(0.0, 17.1, 0.0), aspect=1.0)
    lights = pipeline.make_lights(cfg)
    packed = SF.pack_materials(m.materials, m.atlas)

    img_x = np.asarray(jax.jit(lambda pos, nrm: pipeline.render_frame(
        m, cfg, pipeline.make_dims(cfg), pos, nrm, cam.view_proj(),
        cam.position(), lights))(pos, nrm))
    img_f = np.asarray(jax.jit(lambda pos, nrm: PT.render_frame_mega(
        m, cfg, PT.make_dims_fast(cfg), packed, pos, nrm, cam.view_proj(),
        cam.position(), lights))(pos, nrm))

    assert np.isfinite(img_f).all()
    lx, lf = img_x.mean(-1), img_f.mean(-1)
    covered = (lx > 0.01) | (lf > 0.01)
    d = np.abs(lx - lf)
    frac = (d > 0.02)[covered].mean()
    mean = d[covered].mean()
    # Regression bound at the level measured on hardware (2026-08, 0.54 /
    # 0.047): the bind-pose close-up maximizes sub-pixel hair/face detail,
    # which aliases differently across rasterization orders at ~8:1 texture
    # minification. Guards against gross compiled-vs-interpret divergence
    # (Mosaic compile bugs), not pixel equality.
    assert frac <= 0.60, f"{frac:.4f} of covered pixels differ by > 0.02"
    assert mean <= 0.08, f"mean covered luminance diff {mean:.4f}"


@pytest.mark.skipif(not os.path.exists(MODEL2), reason="assets unavailable")
def test_megakernel_matches_xla_downsampled_and_animated():
    """Tightened on-chip parity (VERDICT r2 item 3): the raw per-pixel
    bound above tolerates sub-pixel rasterization-order aliasing at the
    demo's ~8:1 texture minification; comparing 4x box-DOWNSAMPLED frames
    removes that aliasing and can actually fail on a wrong kernel. Bind
    pose AND an animated pose (pool.vmd @ 1 s — physics-settled hair,
    different silhouettes) both hold a 10x tighter bound.
    """
    import jax

    if jax.default_backend() == "cpu":
        pytest.skip("no TPU backend")
    import jax.numpy as jnp
    import numpy as np

    from reze_tpu.anim import sampler
    from reze_tpu.camera import Camera
    from reze_tpu.core.build import load_model
    from reze_tpu.core.types import EngineConfig
    from reze_tpu.formats.vmd import load_vmd
    from reze_tpu.kernels.skinning import skin_vertices
    from reze_tpu.render import pipeline, pipeline_tpu as PT, shading_fast as SF
    from reze_tpu.skeleton import fk, ik as ik_mod

    cfg = EngineConfig(width=512, height=512, camera_distance=13.5,
                       camera_target=(0.0, 17.1, 0.0), enable_bloom=False,
                       max_tris_per_bin=8192, albedo_bilinear=True,
                       albedo_half_visible=False, albedo_half_occluded=False,
                       albedo_mips=False)
    built = load_model(MODEL2, cfg)
    m = built.arrays
    track = sampler.build_animation(
        load_vmd("/root/reference/web/public/animations/pool.vmd"),
        built.bone_name_to_id, built.morph_name_to_id,
        m.skeleton.j, m.morphs.offsets.shape[0])
    cam = Camera(radius=13.5, target=(0.0, 17.1, 0.0), aspect=1.0)
    lights = pipeline.make_lights(cfg)
    packed = SF.pack_materials(m.materials, m.atlas)

    def pose(t):
        skel = m.skeleton
        rot = jnp.zeros((skel.j, 4)).at[:, 3].set(1.0)
        trans = jnp.zeros((skel.j, 3))
        if t > 0:
            srot, strans = sampler.sample_bones(track, jnp.float32(t))
            rot = jnp.where(track.has_track[:, None], srot, rot)
            trans = jnp.where(track.has_track[:, None], strans, trans)
        if m.ik.n_chains > 0:
            rot = ik_mod.solve_ik(skel, m.ik, rot, trans)
        q, p = fk.world_transforms(skel, rot, trans)
        return skin_vertices(m.geometry, m.skinning,
                             fk.skin_palette(skel, q, p))

    def down4(img):
        h, w, _ = img.shape
        return img.reshape(h // 4, 4, w // 4, 4, 3).mean((1, 3))

    for t in (0.0, 1.0):
        pos, nrm = pose(t)
        img_x = np.asarray(jax.jit(lambda pos, nrm: pipeline.render_frame(
            m, cfg, pipeline.make_dims(cfg), pos, nrm, cam.view_proj(),
            cam.position(), lights))(pos, nrm))
        img_f = np.asarray(jax.jit(lambda pos, nrm: PT.render_frame_mega(
            m, cfg, PT.make_dims_fast(cfg), packed, pos, nrm,
            cam.view_proj(), cam.position(), lights))(pos, nrm))
        assert np.isfinite(img_f).all()
        dx, df = down4(img_x).mean(-1), down4(img_f).mean(-1)
        covered = (dx > 0.01) | (df > 0.01)
        d = np.abs(dx - df)
        frac = (d > 0.02)[covered].mean()
        mean = d[covered].mean()
        assert frac <= 0.06, f"t={t}: {frac:.4f} of 4x-box pixels differ > 0.02"
        assert mean <= 0.01, f"t={t}: mean downsampled diff {mean:.4f}"
