"""One-shot runner: fused whole-tendency Pallas kernel vs XLA on the
radar grid (192x192x48) on the real chip — writes
docs/PALLAS_TENDENCY_r05.json (VERDICT-r4 item 8 measurement)."""
import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_scale_letkf")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, "/root/repo")
from scale_letkf_tpu.bench_fullsize import bench_tendency_fused  # noqa: E402

out = {"platform": jax.devices()[0].device_kind}
for by in (8, 16):
    try:
        out[f"block_y_{by}"] = bench_tendency_fused(reps=30, block_y=by)
    except Exception as e:
        out[f"block_y_{by}"] = f"{type(e).__name__}: {e}"[:400]
    print(json.dumps(out[f"block_y_{by}"]))
    # write incrementally so a truncated session still lands the numbers
    with open("/root/repo/docs/PALLAS_TENDENCY_r05.json", "w") as f:
        json.dump(out, f, indent=1)
print("artifact written")
