#!/usr/bin/env python
"""Compatibility shim: the reference README's run instructions name
``python LK_test.py <video path>`` (reference README.md:4-6) although that
file is absent from the snapshot.  Following those instructions here runs
the equivalent pipeline — the full VP detector (lk_tpu.apps.final)."""

from lk_tpu.apps.final import main

if __name__ == "__main__":
    main()
