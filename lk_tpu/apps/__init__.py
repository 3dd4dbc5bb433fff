"""CLI apps mirroring the five reference scripts (SURVEY.md §1 L7/L8).

``python -m lk_tpu.apps <final|vp_detect|classify|masking|roadlines> <video>``
or the per-module entry points.  All apps run headless by default (the
reference's cv.imshow/waitKey UI loop is replaced by --write-video overlay
output and --plot artifacts)."""
