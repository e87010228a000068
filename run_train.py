#!/usr/bin/env python
"""Canonical launcher: train the VOC config, then aug-test eval.

TPU-native counterpart of the reference's `run_train.py` (which spawns
8 torch.distributed processes). Here one process drives all local chips
through the jitted data-parallel step — no launcher processes needed; on
multi-host pods set JAX_COORDINATOR_ADDR etc. and every host runs this
same script (`jax.distributed.initialize` is picked up in tools/train.py
when JAX_PROCESS_COUNT is set).
"""

import os
import subprocess
import sys

CFG = "configs/attnshift_voc12aug.py"
WORK = "work_dirs/attnshift_voc12aug"


def main():
    args = sys.argv[1:]
    repo = os.path.dirname(os.path.abspath(__file__))
    train = [sys.executable, os.path.join(repo, "tools/train.py"), CFG,
             "--work-dir", WORK] + args
    print("+", " ".join(train), flush=True)
    subprocess.run(train, check=True)

    epoch = 12
    test = [sys.executable, os.path.join(repo, "tools/test.py"), CFG,
            os.path.join(WORK, f"epoch_{epoch}"), "--aug-test",
            "--out", os.path.join(WORK, "eval.json")]
    print("+", " ".join(test), flush=True)
    subprocess.run(test, check=True)


if __name__ == "__main__":
    main()
