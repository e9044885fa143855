"""Console-script entry points (pyproject [project.scripts]).

The repo-root drivers `train_cnc_nerf_synthetic.py` / `train_cnc_tank_temples.py`
remain the reference-shaped CLIs (SURVEY.md §3.1); these thin wrappers make the
same pipelines runnable from a pip install (`cnc-train-nerf-synthetic ...`),
matching the reference's installability (reference setup.py:26-132).
"""

from __future__ import annotations

import os
import runpy
import sys


def _run_root_script(name: str) -> None:
    """Execute the repo-root driver if present (editable install), else the
    vendored copy of its main()."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(root, name)
    if os.path.exists(script):
        sys.path.insert(0, root)
        runpy.run_path(script, run_name="__main__")
        return
    raise SystemExit(
        f"{name} not found next to the cnc_tpu package; run from a source "
        f"checkout or editable install (pip install -e .)")


def main_nerf_synthetic() -> None:
    _run_root_script("train_cnc_nerf_synthetic.py")


def main_tank_temples() -> None:
    _run_root_script("train_cnc_tank_temples.py")
