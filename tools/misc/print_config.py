"""Print the fully-resolved config (covers `tools/misc/print_config.py`).

Resolves `_base_` inheritance and applies `--cfg-options` dotted
overrides, then pretty-prints the final dict — the quickest way to see
what a config actually expands to.

    python tools/misc/print_config.py configs/attnshift_voc12aug.py \
        [--cfg-options model.max_gt=10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from attentionshift_tpu.config import Config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--cfg-options", nargs="*", default=[])
    args = ap.parse_args()
    cfg = Config.fromfile(args.config).merge_from_options(args.cfg_options)
    print(json.dumps(cfg.to_dict(), indent=2, default=repr))


if __name__ == "__main__":
    main()
