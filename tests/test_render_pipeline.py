import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reze_tpu.camera import Camera
from reze_tpu.core.types import EngineConfig
from reze_tpu.render import pipeline, pipeline_tpu, post, shading_fast as SF
from reze_tpu.testing import make_test_model

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def scene():
    model = make_test_model()
    cfg = EngineConfig(width=128, height=64, tile_size=64, max_tris_per_bin=16,
                       enable_bloom=False,
                       # parity fixtures sample albedo at full res, level 0
                       # (the XLA oracle has no mip chain)
                       albedo_half_visible=False, albedo_half_occluded=False,
                       albedo_mips=False)
    cam = Camera(alpha=np.pi, beta=np.pi / 2, radius=4.5, target=(0.0, 2.0, 0.0),
                 aspect=2.0)
    from reze_tpu.skeleton import fk
    from reze_tpu.kernels.skinning import skin_vertices

    skel = model.skeleton
    rot = jnp.zeros((skel.j, 4)).at[:, 3].set(1.0)
    q, p = fk.world_transforms(skel, rot, jnp.zeros((skel.j, 3)))
    pos, nrm = skin_vertices(model.geometry, model.skinning, fk.skin_palette(skel, q, p))
    lights = pipeline.make_lights(cfg)
    return dict(model=model, cfg=cfg, cam=cam, pos=pos, nrm=nrm, lights=lights)


def render_xla(s):
    dims = pipeline.make_dims(s["cfg"])
    return pipeline.render_frame(
        s["model"], s["cfg"], dims, s["pos"], s["nrm"],
        s["cam"].view_proj(), s["cam"].position(), s["lights"],
    )


def render_fast(s):
    dims = pipeline_tpu.make_dims_fast(s["cfg"])
    packed = SF.pack_materials(s["model"].materials, s["model"].atlas)
    return pipeline_tpu.render_frame_fast(
        s["model"], s["cfg"], dims, packed, s["pos"], s["nrm"],
        s["cam"].view_proj(), s["cam"].position(), s["lights"],
        interpret=jax.default_backend() == "cpu",
    )


def test_xla_pipeline_renders_all_classes(scene):
    img = np.asarray(render_xla(scene))
    assert img.shape == (64, 128, 3)
    assert np.isfinite(img).all()
    # all four stacked quads (opaque/eye/hair/transparent) produce pixels
    assert (img.sum(-1) > 0.01).sum() > 150


def test_fast_pipeline_matches_xla(scene):
    """The Pallas path (interpret mode on CPU) must track the XLA reference
    away from texture filtering differences (nearest vs bilinear)."""
    ref = np.asarray(render_xla(scene))
    fast = np.asarray(render_fast(scene))
    assert fast.shape == ref.shape
    covered = (ref.sum(-1) > 0.01) | (fast.sum(-1) > 0.01)
    diff = np.abs(ref - fast).max(-1)
    # most covered pixels agree closely; edges + filtering may differ
    frac_bad = (diff[covered] > 0.12).mean() if covered.any() else 0.0
    assert frac_bad < 0.15, frac_bad
    # coverage footprint agrees
    assert abs(int((ref.sum(-1) > 0.01).sum()) - int((fast.sum(-1) > 0.01).sum())) < 0.1 * covered.sum()


def test_golden_frame(scene):
    """Deterministic regression snapshot of the XLA renderer."""
    img = np.asarray(render_xla(scene))
    path = os.path.join(GOLDEN_DIR, "synthetic_xla_128x64.npz")
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, img=img)
        pytest.skip("golden created")
    golden = np.load(path)["img"]
    np.testing.assert_allclose(img, golden, atol=2e-3)


def test_bloom_brightens_above_threshold():
    img = jnp.zeros((64, 64, 3)).at[30:34, 30:34].set(1.0)
    out = np.asarray(post.apply_bloom(img, threshold=0.3, intensity=0.5))
    # energy spreads outside the bright square
    assert out[28, 28].sum() > 0
    assert out[32, 32].sum() >= img[32, 32].sum()


def test_camera_ops():
    cam = Camera(alpha=1.0, beta=1.2, radius=10.0, target=(0, 5, 0))
    assert cam.orbit(10, 0).alpha < cam.alpha
    assert cam.zoom(100).radius > cam.radius
    panned = cam.pan(50, 0)
    assert panned.target != cam.target
    # beta clamped
    assert cam.orbit(0, -1e6).beta <= cam.upper_beta_limit


def test_big_triangle_full_coverage():
    """A triangle spanning many tiles must rasterize in every tile it touches
    (pack_tables enumerates (bin, tri) pairs exactly — no per-tri slot cap)."""
    from reze_tpu.kernels import raster_tpu as RT
    from reze_tpu.render import raster as R

    wp, hp = 512, 256  # 4 x 8 = 32 tiles of (32, 128)
    # one huge triangle covering the whole framebuffer
    corners = jnp.asarray([
        [[-4.0, -4.0, 0.5, 1.0], [4.0, -4.0, 0.5, 1.0], [0.0, 8.0, 0.5, 1.0]]
    ])
    valid = jnp.ones((1,), bool)
    tri = R.setup_triangles(corners, valid, wp, hp, R.CULL_NONE)
    tabs = RT.pack_tables(
        tri, jnp.zeros((1, 3, 2)), jnp.zeros((1, 3, 3)),
        jnp.zeros((1,), jnp.int32), hp // RT.TILE_H, wp // RT.TILE_W,
    )
    # every tile gets exactly one pair
    assert int(np.asarray(tabs.counts).sum()) == 32
    assert int(tabs.overflow) == 0
    zbuf = jnp.full((1, hp, wp), 1.0)
    zb, gbuf = RT.raster_pass_tpu(tabs, zbuf, bx=wp // RT.TILE_W,
                                  depth_write=True, interpret=True)
    cover = np.asarray(gbuf[RT.CH_COVER])
    # every tile is mostly covered
    tiles = cover.reshape(hp // RT.TILE_H, RT.TILE_H, wp // RT.TILE_W, RT.TILE_W)
    assert (tiles.mean((1, 3)) > 0.5).all()


@pytest.mark.parametrize("rasterizer", ["mxu", "stream", "hybrid"])
def test_matmul_rasterizers_match_group(scene, rasterizer):
    """rasterizer="mxu"/"stream" vs the grouped megakernel (interpret mode).

    The formulations share the pass/stack semantics; they differ in winner
    tie resolution (the matmul paths quantize z in the packed winner key)
    and in plane-evaluation rounding (MXU HIGHEST-precision dot vs VPU FMA
    chains). On this edge-heavy synthetic scene (4 small stacked quads --
    nearly every covered pixel is a silhouette or a coplanar tie) those
    last-ulp differences flip ~12% of covered pixels; the bound locks in
    that level. The real-model parity test (filled content) is the tight
    one. The frame must be >1 tile wide so the per-tile origin correction
    in the plane matmuls is exercised (ADVICE r2)."""
    import dataclasses

    s = dict(scene)
    cfg = dataclasses.replace(
        scene["cfg"], width=256, height=64,
        albedo_half_visible=False, albedo_half_occluded=False,
    )
    dims = pipeline_tpu.make_dims_fast(cfg)
    packed = SF.pack_materials(s["model"].materials, s["model"].atlas)

    def render(r):
        c = dataclasses.replace(cfg, rasterizer=r)
        return np.asarray(pipeline_tpu.render_frame_mega(
            s["model"], c, dims, packed, s["pos"], s["nrm"],
            s["cam"].view_proj(), s["cam"].position(), s["lights"],
            interpret=True,
        ))

    group = render("group")
    other = render(rasterizer)
    covered = (group.sum(-1) > 0.01) | (other.sum(-1) > 0.01)
    assert covered.sum() > 100  # sanity: the scene actually draws
    diff = np.abs(group - other).max(-1)
    frac_bad = (diff[covered] > 0.02).mean() if covered.any() else 1.0
    assert frac_bad < 0.15, f"{frac_bad:.4f} of covered pixels differ"


def test_hybrid_analytic_matches_group_analytic(scene):
    """The hybrid (MXU-chunk) kernel in analytic-coverage mode vs the
    grouped kernel in the same mode: identical coverage math, different
    plane-evaluation engine (matmul vs per-row FMA) and winner ordering
    (quantized packed key). Same bound rationale as the test above."""
    import dataclasses

    s = dict(scene)
    cfg = dataclasses.replace(
        scene["cfg"], width=256, height=64, msaa_mode="analytic",
        albedo_half_visible=False, albedo_half_occluded=False,
    )
    dims = pipeline_tpu.make_dims_fast(cfg)
    packed = SF.pack_materials(s["model"].materials, s["model"].atlas)

    def render(r):
        c = dataclasses.replace(cfg, rasterizer=r)
        return np.asarray(pipeline_tpu.render_frame_mega(
            s["model"], c, dims, packed, s["pos"], s["nrm"],
            s["cam"].view_proj(), s["cam"].position(), s["lights"],
            interpret=True,
        ))

    group = render("group")
    other = render("hybrid")
    covered = (group.sum(-1) > 0.01) | (other.sum(-1) > 0.01)
    assert covered.sum() > 100
    diff = np.abs(group - other).max(-1)
    frac_bad = (diff[covered] > 0.02).mean() if covered.any() else 1.0
    assert frac_bad < 0.15, f"{frac_bad:.4f} of covered pixels differ"


def test_pair_overflow_detected():
    from reze_tpu.kernels import raster_tpu as RT
    from reze_tpu.render import raster as R

    wp, hp = 512, 256
    # 8192 full-screen triangles -> 8192*32 pairs >> cap
    corners = jnp.broadcast_to(
        jnp.asarray([[[-4.0, -4.0, 0.5, 1.0], [4.0, -4.0, 0.5, 1.0],
                      [0.0, 8.0, 0.5, 1.0]]]), (8192, 3, 4))
    tri = R.setup_triangles(corners, jnp.ones((8192,), bool), wp, hp, R.CULL_NONE)
    tabs = RT.pack_tables(
        tri, jnp.zeros((8192, 3, 2)), jnp.zeros((8192, 3, 3)),
        jnp.zeros((8192,), jnp.int32), hp // RT.TILE_H, wp // RT.TILE_W,
    )
    assert int(tabs.overflow) == 8192 * 32 - 2 * RT.MAX_TRIS_PER_CALL


def test_non_pot_texture_parity():
    """Odd texture/mip strides must decode correctly from the packed
    O_DXDY channel (advisor r3: dxdy = dx + 2*dy so mod-2 stays exact for
    odd dy strides — an 11-wide texture has odd strides at levels 0 and 1).
    Renders the Pallas fast path with a 7x11 texture against the XLA oracle
    (mips off), then checks the mip path stays close to the level-0 path."""
    import dataclasses

    from reze_tpu.kernels.skinning import skin_vertices
    from reze_tpu.skeleton import fk

    model = make_test_model(tex_hw=(7, 11))
    cfg = EngineConfig(width=128, height=64, tile_size=64, max_tris_per_bin=16,
                       enable_bloom=False, albedo_half_visible=False,
                       albedo_half_occluded=False, albedo_mips=False)
    cam = Camera(alpha=np.pi, beta=np.pi / 2, radius=4.5,
                 target=(0.0, 2.0, 0.0), aspect=2.0)
    skel = model.skeleton
    rot = jnp.zeros((skel.j, 4)).at[:, 3].set(1.0)
    q, p = fk.world_transforms(skel, rot, jnp.zeros((skel.j, 3)))
    pos, nrm = skin_vertices(model.geometry, model.skinning,
                             fk.skin_palette(skel, q, p))
    lights = pipeline.make_lights(cfg)
    s = dict(model=model, cfg=cfg, cam=cam, pos=pos, nrm=nrm, lights=lights)

    ref = np.asarray(render_xla(s))
    fast = np.asarray(render_fast(s))
    covered = (ref.sum(-1) > 0.01) | (fast.sum(-1) > 0.01)
    assert covered.sum() > 100
    diff = np.abs(ref - fast).max(-1)
    frac_bad = (diff[covered] > 0.12).mean()
    assert frac_bad < 0.15, frac_bad

    # mip chain on, 1:1-ish sampling -> level 0/1 dominate; odd level-1
    # width (5) exercises the mip branch's encoding
    s_mip = dict(s, cfg=dataclasses.replace(cfg, albedo_mips=True))
    mip = np.asarray(render_fast(s_mip))
    diff_m = np.abs(mip - fast).max(-1)
    frac_bad_m = (diff_m[covered] > 0.15).mean()
    assert frac_bad_m < 0.2, frac_bad_m


def test_analytic_aa_close_to_msaa(scene):
    """msaa_mode="analytic" (one center depth test + fractional coverage
    from exact edge distances) vs the 4x MSAA megakernel. The modes agree
    on interior pixels exactly; silhouette pixels may differ by up to one
    coverage quantum. This synthetic scene is silhouette-heavy (small
    stacked quads), so the bound is intentionally interior-driven: mean
    divergence small, outliers confined to edge pixels."""
    import dataclasses

    s = dict(scene)
    cfg = dataclasses.replace(
        scene["cfg"], width=256, height=64,
        albedo_half_visible=False, albedo_half_occluded=False,
    )
    dims = pipeline_tpu.make_dims_fast(cfg)
    packed = SF.pack_materials(s["model"].materials, s["model"].atlas)

    def render(mode):
        c = dataclasses.replace(cfg, msaa_mode=mode)
        return np.asarray(pipeline_tpu.render_frame_mega(
            s["model"], c, dims, packed, s["pos"], s["nrm"],
            s["cam"].view_proj(), s["cam"].position(), s["lights"],
            interpret=True,
        ))

    msaa = render("msaa")
    ana = render("analytic")
    covered = (msaa.sum(-1) > 0.01) | (ana.sum(-1) > 0.01)
    assert covered.sum() > 100
    diff = np.abs(msaa - ana).max(-1)
    # interior pixels identical; divergence confined to silhouettes
    assert diff[covered].mean() < 0.03, diff[covered].mean()
    assert (diff[covered] > 0.25).mean() < 0.10


@pytest.mark.parametrize("mips", [False, True])
def test_quad_bilinear_matches_4gather(scene, mips):
    """Quad-packed bilinear (ONE 16-byte gather per pixel,
    core/build.py build_quad_chain) must reproduce the 4-gather bilinear
    path exactly: the quad rows bake the same edge-clamped neighbor steps
    the shade kernel encodes in O_DXDY (shade_tpu.py:198-211)."""
    import dataclasses

    s = dict(scene)
    cfg = dataclasses.replace(
        scene["cfg"], albedo_bilinear=True, albedo_mips=mips,
        # exercise both the full-res and the half-res quad fetch
        albedo_half_visible=False, albedo_half_occluded=True,
    )
    dims = pipeline_tpu.make_dims_fast(cfg)
    packed = SF.pack_materials(s["model"].materials, s["model"].atlas)

    def render(quad_on):
        model = s["model"]
        if not quad_on:
            model = model.replace(atlas=model.atlas.replace(
                mip_quad=None, flat_quad=None))
        return np.asarray(pipeline_tpu.render_frame_mega(
            model, cfg, dims, packed, s["pos"], s["nrm"],
            s["cam"].view_proj(), s["cam"].position(), s["lights"],
            interpret=True,
        ))

    ref = render(False)   # 4-gather bilinear
    quad = render(True)   # 1-gather quad bilinear
    assert np.abs(ref - quad).max() < 1e-5, np.abs(ref - quad).max()


@pytest.mark.parametrize("group,yband,mode", [
    (16, False, "msaa"), (32, False, "msaa"),
    (8, True, "msaa"), (32, True, "msaa"),
    (32, True, "analytic"),
])
def test_group_size_and_yband_bitexact(scene, group, yband, mode):
    """Sublane group size and the y-band row loop are pure scheduling
    choices: per-pair plane math is identical, the min-z/latest-draw winner
    is associative across group boundaries (later group wins ties via
    zmin <= cur_z, matching the in-group latest-sublane rule), and the
    y-band skips only rows whose any_pass is provably all-false — so every
    variant must match the default (group=8, static rows) BIT-EXACTLY."""
    import dataclasses

    from reze_tpu.kernels import frame_tpu as FT

    s = dict(scene)
    cfg = dataclasses.replace(
        scene["cfg"], width=256, height=64, msaa_mode=mode,
        albedo_half_visible=False, albedo_half_occluded=False,
    )
    dims = pipeline_tpu.make_dims_fast(cfg)
    packed = SF.pack_materials(s["model"].materials, s["model"].atlas)

    def render(g, yb):
        old = FT.GROUP, FT.YBAND
        FT.GROUP, FT.YBAND = g, yb
        try:
            return np.asarray(pipeline_tpu.render_frame_mega(
                s["model"], cfg, dims, packed, s["pos"], s["nrm"],
                s["cam"].view_proj(), s["cam"].position(), s["lights"],
                interpret=True,
            ))
        finally:
            FT.GROUP, FT.YBAND = old

    ref = render(8, False)
    var = render(group, yband)
    assert (ref.sum(-1) > 0.01).sum() > 100  # scene draws
    assert np.array_equal(ref, var), np.abs(ref - var).max()
