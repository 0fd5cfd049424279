#!/usr/bin/env python
"""One-command validation: pytest suite, driver-contract drive at sf0.01,
bench at sf0.1. Exit nonzero on any failure. Run from anywhere."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
steps = [
    (["python", "-m", "pytest", "tests/", "-q"], REPO),
    (["python", os.path.join(REPO, "tests", "drive_entry.py")], "/tmp"),
    (["python", os.path.join(REPO, "bench.py")], "/tmp"),
]
for cmd, cwd in steps:
    print(f"==> {' '.join(cmd)} (cwd={cwd})", flush=True)
    r = subprocess.run(cmd, cwd=cwd)
    if r.returncode != 0:
        sys.exit(r.returncode)
print("ALL VALIDATION PASSED")
