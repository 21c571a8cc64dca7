"""Round-5 single-process TPU measurement session.

The axon pool handshake is a lottery today (5 s - 10 min+ per client,
measured), so every probe runs inside ONE process / ONE handshake.
Each stage is wrapped: a failure logs and moves on.  Stages mirror
benchmarks/r5_session2c.sh in value order.

Usage: python benchmarks/r5_mega.py [stage ...]   (default: all)
"""

import os
import runpy
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = {
    "tune2":    ("benchmarks/bcap_tune2.py", []),
    "bcap2":    ("benchmarks/bcap2_probe.py", []),
    "vpkern":   ("benchmarks/vp_kernel_probe.py", []),
    "mstwarm":  ("benchmarks/mst_probe.py", ["1000000", "8", "5"]),
    "sweep1":   ("benchmarks/run.py", ["config1"]),
    "sweep2":   ("benchmarks/run.py", ["config2"]),
    "sweep4":   ("benchmarks/run.py", ["config4"]),
    "rdecomp":  ("benchmarks/radius_decomp_probe.py",
                 ["100000", "4096", "4"]),
    "mst2dual": ("benchmarks/mst_probe.py", ["300000", "2", "5", "dual"]),
    "mst2scan": ("benchmarks/mst_probe.py", ["300000", "2", "5", "scan"]),
}


def main():
    names = sys.argv[1:] or list(STAGES)
    import jax
    t0 = time.time()
    print(f"[mega] devices={jax.devices()} (handshake pending)", flush=True)
    import numpy as np
    import jax.numpy as jnp
    np.asarray(jnp.zeros((8, 128)).sum())     # pay the handshake ONCE here
    print(f"[mega] handshake + first op: {time.time() - t0:.0f}s",
          flush=True)
    for name in names:
        script, args = STAGES[name]
        print(f"\n######## {name}: {script} {' '.join(args)} "
              f"({time.strftime('%H:%M:%S')}) ########", flush=True)
        sys.argv = [script] + args
        ts = time.time()
        try:
            runpy.run_path(script, run_name="__main__")
            print(f"######## {name} done in {time.time() - ts:.0f}s",
                  flush=True)
        except SystemExit as exc:
            print(f"######## {name} SystemExit({exc.code}) "
                  f"after {time.time() - ts:.0f}s", flush=True)
        except Exception:
            traceback.print_exc()
            print(f"######## {name} FAILED after {time.time() - ts:.0f}s",
                  flush=True)
    print(f"\n[mega] ALL DONE {time.strftime('%H:%M:%S')} "
          f"(total {time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
