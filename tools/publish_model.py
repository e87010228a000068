#!/usr/bin/env python
"""Weight-only checkpoint export (`tools/model_converters/publish_model.py`
analog): strips optimizer state and counters from a training checkpoint.

    python tools/publish_model.py work_dirs/voc/epoch_12 out/voc_final
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint")
    p.add_argument("out")
    args = p.parse_args()
    import orbax.checkpoint as ocp

    from attentionshift_tpu.train.checkpoint import save_params

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(args.checkpoint))
    path = save_params(args.out, restored["params"])
    print(f"published weights-only checkpoint to {path}")


if __name__ == "__main__":
    main()
