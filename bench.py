"""Benchmark: step+render FPS on one chip for the reference workload.

Prints ONE JSON line (the shipped default config):
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}
plus a stderr line with the reference-fidelity-parity config's FPS
(full-res bilinear level-0 albedo, the browser sampler of
engine.ts:188-194, no mip prefilter) so the headline number and the
parity claim are measured side by side (VERDICT r2 weak #7).

Baseline target (BASELINE.json): >= 240 step+render FPS for the ~20k-vertex
PMX reference model at 1080p on one TPU v5e chip. The measured loop is the
FULL pipeline — VMD sampling, FK, IK, physics (257 bodies / 406 joints),
skinning, rasterization with MSAA, toon shading, bloom — iterated entirely
on-device via lax.scan (zero host round-trips, matching the engine design).

Env knobs: BENCH_WIDTH/BENCH_HEIGHT (default 1920x1080), BENCH_FRAMES,
BENCH_REPS, BENCH_PARITY=0 to skip the parity-config run,
BENCH_PROBE=0 to skip the chip-health probe.

The official capture must never die to a wedged TPU worker (round-3
incident: BENCH_r03.json rc:1 "Unable to initialize backend"): a trivial
matmul probes the chip first, backend-init failures retry with backoff,
and every failure path still prints ONE parseable JSON line.

Round-5 finding: the r3/r4 "probe timed out" captures were SELF-INFLICTED.
Killing an axon-attached python process (SIGTERM/SIGKILL, including
subprocess.run(timeout=...) expiry) wedges the TPU tunnel for ~5-10
minutes; the next probe then times out, gets killed, and re-wedges it — a
self-perpetuating cascade (reproduced 2026-08-19: probe OK at 11:25:05,
kill of an idle attached process at ~11:25:55, probe timeout at 11:26:32,
outage for ~10 min; the same cascade explains every r3-r5 "wedged worker"
incident). The chip itself was healthy throughout. Therefore: NO probe
subprocess by default (BENCH_PROBE=1 opts in for diagnostics only) and NO
process killing — the in-process attempt IS the probe, and a watchdog
thread prints ONE parseable JSON failure line + exits if it hangs past
BENCH_DEADLINE (default 540 s). Outage windows self-heal; patience, not
retries-with-kills.
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys
import time
import traceback

WIDTH = int(os.environ.get("BENCH_WIDTH", 1920))
HEIGHT = int(os.environ.get("BENCH_HEIGHT", 1080))
FRAMES = int(os.environ.get("BENCH_FRAMES", 20))
REPS = int(os.environ.get("BENCH_REPS", 3))
BASELINE_FPS = 240.0

PROBE_TIMEOUT_S = int(os.environ.get("BENCH_PROBE_TIMEOUT", 45))
PROBE_RETRIES = int(os.environ.get("BENCH_PROBE_RETRIES", 1))
PROBE_BACKOFF_S = 15
DEADLINE_S = int(os.environ.get("BENCH_DEADLINE", 600))

_PROBE_SRC = """
import jax, jax.numpy as jnp
x = jnp.ones((64, 64))
y = (x @ x).block_until_ready()
print("PROBE_OK", jax.devices()[0].platform, float(y[0, 0]))
"""


def probe_chip() -> dict:
    """Run a trivial matmul in a SUBPROCESS (so a hung backend init can be
    timed out without wedging this process), with bounded retry+backoff.
    Returns {"ok": bool, "attempts": n, "detail": str}."""
    detail = ""
    for attempt in range(1, PROBE_RETRIES + 1):
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC],
                capture_output=True, text=True, timeout=PROBE_TIMEOUT_S,
            )
            if r.returncode == 0 and "PROBE_OK" in r.stdout:
                return {"ok": True, "attempts": attempt,
                        "detail": r.stdout.strip().splitlines()[-1]}
            detail = (r.stderr or r.stdout).strip().splitlines()[-1][:300] if (r.stderr or r.stdout).strip() else f"rc={r.returncode}"
        except subprocess.TimeoutExpired:
            detail = f"probe timed out after {PROBE_TIMEOUT_S}s"
        if attempt < PROBE_RETRIES:
            print(f"# chip probe attempt {attempt} failed ({detail}); "
                  f"backing off {PROBE_BACKOFF_S}s", file=sys.stderr)
            time.sleep(PROBE_BACKOFF_S)
    return {"ok": False, "attempts": PROBE_RETRIES, "detail": detail}


def emit_failure(stage: str, detail: str, probe: dict | None = None) -> None:
    """Diagnostic JSON line so the driver records a parseable result."""
    print(json.dumps({
        "metric": f"step+render frames/sec/chip ({WIDTH}x{HEIGHT}) [FAILED: {stage}]",
        "value": 0.0,
        "unit": "frames/sec",
        "vs_baseline": 0.0,
        "error": detail[:500],
        "probe": probe,
    }))


def main():
    probe = None
    if os.environ.get("BENCH_PROBE", "0") == "1":
        # opt-in diagnostics only: a timed-out probe subprocess gets
        # KILLED, and killing an attached process wedges the tunnel
        probe = probe_chip()
        print(f"# probe: {probe}", file=sys.stderr)

    import threading
    done = threading.Event()
    partial: dict = {}

    def watchdog():
        if not done.wait(DEADLINE_S):
            if partial:  # headline finished; parity leg hung — ship it
                partial["parity_error"] = \
                    f"parity leg hit the {DEADLINE_S}s deadline"
                print(json.dumps(partial))
            else:
                emit_failure(
                    "deadline",
                    f"pipeline did not finish within {DEADLINE_S}s "
                    f"(chip or tunnel hang)", probe)
            sys.stdout.flush()
            os._exit(0)

    threading.Thread(target=watchdog, daemon=True).start()
    try:
        run_bench(probe, partial)
    except Exception as e:  # noqa: BLE001 — always emit parseable JSON
        traceback.print_exc(file=sys.stderr)
        if partial:
            partial["parity_error"] = f"{type(e).__name__}: {e}"[:200]
            print(json.dumps(partial))
        else:
            emit_failure("pipeline", f"{type(e).__name__}: {e}", probe)
    finally:
        done.set()


def run_bench(probe, partial):
    import jax
    import jax.numpy as jnp

    from reze_tpu.camera import Camera
    from reze_tpu.core.build import load_model
    from reze_tpu.core.types import EngineConfig, init_scene_state
    from reze_tpu.anim import sampler
    from reze_tpu.formats.vmd import load_vmd
    from reze_tpu.render import pipeline
    from reze_tpu.step import make_step

    cfg = EngineConfig(
        width=WIDTH, height=HEIGHT, ambient=1.0, bloom_intensity=0.13,
        rim_light_intensity=0.35, camera_distance=13.5,
        camera_target=(0.0, 17.1, 0.0),
        max_tris_per_bin=int(os.environ.get("BENCH_BIN_CAP", 1024)),
        rasterizer=os.environ.get("BENCH_RASTERIZER", "group"),
        msaa_samples=int(os.environ.get("BENCH_MSAA", 4)),
        # measure the ENGINE DEFAULT AA mode (msaa: 2.5x closer to the
        # per-sample color-resolve oracle than analytic, core/types.py) so
        # the headline number describes the config users actually get
        msaa_mode=os.environ.get("BENCH_MSAA_MODE", "msaa"),
        enable_physics=os.environ.get("BENCH_PHYSICS", "1") == "1",
        enable_bloom=os.environ.get("BENCH_BLOOM", "1") == "1",
        enable_ik=os.environ.get("BENCH_IK", "1") == "1",
    )
    built = load_model("/root/reference/web/public/models/塞尔凯特2/塞尔凯特2.pmx", cfg)
    model = built.arrays
    dims = pipeline.make_dims(cfg)
    lights = pipeline.make_lights(cfg)
    motion = load_vmd("/root/reference/web/public/animations/pool.vmd")
    track = jax.device_put(
        sampler.build_animation(
            motion, built.bone_name_to_id, built.morph_name_to_id,
            model.skeleton.j, model.morphs.offsets.shape[0],
        )
    )
    j = model.skeleton.j
    breath = {
        "mask": jnp.zeros(j, bool), "ranges": jnp.zeros(j),
        "base": jnp.zeros((j, 4)).at[:, 3].set(1.0),
        "half_cycle": jnp.float32(2.5), "start": jnp.float32(track.duration + 0.2),
    }
    cam = Camera(radius=cfg.camera_distance, target=cfg.camera_target, aspect=WIDTH / HEIGHT)
    vp, eye = cam.view_proj(), cam.position()
    dt = jnp.float32(1.0 / 60.0)

    def bench_config(c, c_model=None):
        if c_model is None:
            c_model = model
        # model as a jit ARGUMENT: closure-captured model arrays become HLO
        # literals, and the parity config's full-res level-0 quad atlas
        # pushed the serialized program past the compile tunnel's request
        # cap (HTTP 413, BENCH_r04/r05 parity legs)
        step = make_step(c_model, c, dims, model_as_arg=True)
        state = init_scene_state(c_model).replace(playing=jnp.array(True))

        def run_n(mdl, state, n_frames):
            def body(carry, _):
                s, _ = carry
                s2, frame = step(mdl, s, dt, vp, eye, lights, track, breath)
                return (s2, frame), None

            (s, frame), _ = jax.lax.scan(
                body, (state, jnp.zeros((HEIGHT, WIDTH, 3))), None,
                length=n_frames,
            )
            return s, frame

        run = jax.jit(run_n, static_argnums=(2,), donate_argnums=(1,))
        t0 = time.time()
        # warm with the MEASURED length: n is static, so warming with a
        # different n compiles a different program and rep 1 then pays a
        # second full compile (measured: 83 s "rep" -> 0.12 FPS artifact)
        state, frame = run(c_model, state, FRAMES)
        jax.block_until_ready(frame)
        compile_s = time.time() - t0
        best = 0.0
        for _ in range(REPS):
            t0 = time.time()
            state, frame = run(c_model, state, FRAMES)
            jax.block_until_ready(frame)
            best = max(best, FRAMES / (time.time() - t0))
        return best, compile_s

    best, compile_s = bench_config(cfg)
    aa = "4xMSAA" if cfg.msaa_mode == "msaa" else \
        "analytic-AA (4xMSAA-oracle-bounded)"
    result = partial
    result.update({
        "metric": f"step+render frames/sec/chip ({WIDTH}x{HEIGHT}, "
                  f"28.8k-vert PMX, physics+IK+{aa}+bloom)",
        "value": round(best, 2),
        "unit": "frames/sec",
        "vs_baseline": round(best / BASELINE_FPS, 4),
    })
    print(f"# headline: {best:.2f} FPS, compile: {compile_s:.1f}s, "
          f"device: {jax.devices()[0]}", file=sys.stderr)

    if os.environ.get("BENCH_PARITY", "1") != "0":
        # reference-fidelity parity: the browser's sampler is full-res
        # bilinear level-0 (engine.ts:188-194). The model must carry the
        # level-0 quad atlas (flat_quad) for the 1-gather bilinear path —
        # the 4-tap XLA fallback serializes past the compile tunnel's
        # request cap at 1080p (HTTP 413, BENCH_r04 first capture).
        parity_cfg = dataclasses.replace(
            cfg, albedo_bilinear=True, albedo_half_visible=False,
            albedo_half_occluded=False, albedo_mips=False,
        )
        try:
            pbuilt = load_model(
                "/root/reference/web/public/models/塞尔凯特2/塞尔凯特2.pmx",
                parity_cfg)
            p_best, _ = bench_config(parity_cfg, pbuilt.arrays)
            result["parity_fps"] = round(p_best, 2)
            result["parity_vs_baseline"] = round(p_best / BASELINE_FPS, 4)
            print(
                f"# parity config (full-res bilinear level-0 albedo): "
                f"{p_best:.2f} FPS ({p_best / BASELINE_FPS:.4f} of baseline)",
                file=sys.stderr,
            )
        except Exception as e:  # noqa: BLE001 — record, keep the headline
            traceback.print_exc(file=sys.stderr)
            result["parity_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(result))
    partial.clear()  # printed; main/watchdog must not print again


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
