"""lk.classify — the single-pool variant with contrast enhancement (mirrors
reference LK3_classification.py: one point pool over all 4 sub-masks, EXT
replenishment, tone curve in preprocess, CSV row once per shown frame).

Usage: python -m lk_tpu.apps.classify <video>  (or --synthetic)
"""

from lk_tpu.apps._common import build_parser, run_vp_app
from lk_tpu.models import CLASSIFY


def main(argv=None):
    args = build_parser(__doc__).parse_args(argv)
    return run_vp_app(CLASSIFY, args)


if __name__ == "__main__":
    main()
