"""Dispatcher: python -m lk_tpu.apps <app> [args...]"""

import sys

APPS = ("final", "vp_detect", "classify", "masking", "roadlines", "serve")


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in APPS:
        print(f"usage: python -m lk_tpu.apps <{'|'.join(APPS)}> [args...]")
        raise SystemExit(2)
    app = sys.argv[1]
    argv = sys.argv[2:]
    module = __import__(f"lk_tpu.apps.{app}", fromlist=["main"])
    module.main(argv)


if __name__ == "__main__":
    main()
