"""The reference demo (web/app/page.tsx:11-331), headless.

Loads 塞尔凯特2, plays pool.vmd with the same options the web demo uses
(ambient 1.0, bloom 0.13, rim 0.35, camera distance 13.5 at target
(0, 17.1, 0), breathing on 右ひじ/左ひじ/腰/首), renders a short clip and
writes PNG frames + an animated GIF.

Usage: python examples/demo.py [--frames 45] [--size 512] [--out /tmp/demo]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--frames", type=int, default=45)
parser.add_argument("--size", type=int, default=512)
parser.add_argument("--out", default="/tmp/demo")
parser.add_argument("--drag", action="store_true",
                    help="demo the rotateBones drag interaction mid-clip")
args = parser.parse_args()

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the sandbox preregisters the TPU plugin; honor the env override
    import jax

    jax.config.update("jax_platforms", "cpu")

from reze_tpu import Engine, EngineConfig  # noqa: E402

MODELS = "/root/reference/web/public"

cfg = EngineConfig(
    width=args.size,
    height=args.size,
    ambient=1.0,
    bloom_intensity=0.13,
    rim_light_intensity=0.35,
    camera_distance=13.5,
    camera_target=(0.0, 17.1, 0.0),
)

engine = Engine(cfg)
engine.init()
engine.load_model(f"{MODELS}/models/塞尔凯特2/塞尔凯特2.pmx")
engine.load_animation(f"{MODELS}/animations/pool.vmd")
engine.play_animation(
    breath_bones={"右ひじ": 0.015, "左ひじ": 0.015, "腰": 0.002, "首": 0.005},
    breath_duration=5000,
)

os.makedirs(args.out, exist_ok=True)
frames = []
t0 = time.time()
for i in range(args.frames):
    if args.drag and i == 20:
        # the demo page rotates センター on drag (page.tsx:149-293)
        import numpy as np

        engine.rotate_bones(
            ["センター"], [np.array([0.0, np.sin(0.15), 0.0, np.cos(0.15)])], 300
        )
    frames.append(engine.render(dt=1 / 30))
elapsed = time.time() - t0
stats = engine.get_stats()
print(f"{args.frames} frames in {elapsed:.1f}s "
      f"({args.frames/elapsed:.1f} FPS) — stats: {stats}")

from PIL import Image  # noqa: E402

imgs = [Image.fromarray(f) for f in frames]
for i, im in enumerate(imgs):
    im.save(f"{args.out}/frame_{i:04d}.png")
imgs[0].save(
    f"{args.out}/demo.gif", save_all=True, append_images=imgs[1:],
    duration=33, loop=0,
)
print(f"wrote {args.out}/demo.gif and {len(imgs)} PNGs")
