"""CLI-parity shim: the reference is launched as

    python examples/segmentation/train.py --cfg cfgs/tooth_semi/transformer_finetune_fixmatch_ntm.yaml [k=v ...]

(reference ``README.md:34``); this forwards to ``geot_tpu.engine.train``.
"""
import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

from geot_tpu.engine.train import parse_and_run  # noqa: E402

if __name__ == "__main__":
    parse_and_run()
