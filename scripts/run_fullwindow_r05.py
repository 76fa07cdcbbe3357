"""One-shot runner: the COMPLETE 18-km cycle with the full 6-h window
(all 720 steps, production composition, 4-D LTIMESLOT slots) on the
device-resident executor — produces docs/FULLSIZE_18KM_FULLWINDOW_r05.txt.

K=4 members for wall-clock budget: the per-member-step device cost is
batch-size-determined (batch 2, identical to the K=50 configuration) and
reported as such in the artifact.
"""
import io
import json
import sys
import contextlib

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_scale_letkf")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, "/root/repo")
from scale_letkf_tpu.bench_fullsize import bench_18km_cycle_resident  # noqa: E402

buf = io.StringIO()


class Tee(io.TextIOBase):
    def write(self, s):
        buf.write(s)
        sys.__stdout__.write(s)
        sys.__stdout__.flush()
        return len(s)


with contextlib.redirect_stdout(Tee()):
    out = bench_18km_cycle_resident(members=4)
    print("RESULT " + json.dumps(out))

with open("/root/repo/docs/FULLSIZE_18KM_FULLWINDOW_r05.txt", "w") as f:
    f.write(buf.getvalue())
    f.write("\n" + json.dumps(out, indent=1) + "\n")
print("artifact written")
