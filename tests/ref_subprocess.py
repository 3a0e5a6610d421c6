"""Run the mounted reference's preprocessors in a SUBPROCESS.

The reference tree (/root/reference) is untrusted content; executing it
in-process would run arbitrary code with the test suite's privileges.
These helpers pin the exact entry point, run it in a child interpreter,
and exchange data via serialized numpy arrays — the same isolation
pattern test_pallas_tpu_hw.py uses for the real-chip check.
"""

import os
import subprocess
import sys

import numpy as np

_NCMAPSS_SCRIPT = r"""
import json, os, sys
import numpy as np
root, window_size, stride, subsampling, out_npz = sys.argv[1:6]
os.chdir(root)  # reference saves Processed_dataset/ relative to cwd
sys.path.insert(0, "/root/reference/Data_Process")
from Data_read_NCMAPSS import NCMAPSS
ref = NCMAPSS(root, window_size=int(window_size), stride=int(stride),
              subsampling=int(subsampling))
out = {
    "train_x": np.asarray(ref.train_x, np.float32),
    "train_y": np.asarray(ref.train_y, np.float32),
}
for u in ref.test_x:
    out[f"test_x_{u}"] = np.asarray(ref.test_x[u], np.float32)
    out[f"test_y_{u}"] = np.asarray(ref.test_y[u], np.float32)
    out[f"max_rul_{u}"] = np.asarray(float(ref.max_rul[u]))
np.savez(out_npz, **out)
"""


def run_reference_ncmapss(root, window_size, stride, subsampling, out_npz):
    """Run the reference N-CMAPSS preprocessor (pinned entry point
    Data_Process/Data_read_NCMAPSS.py::NCMAPSS) in a subprocess.

    Side effect: writes the reference's own .pt artifacts under
    ``root/Processed_dataset/NCMAPSS`` (used by the loader-compat test).
    Returns the parsed arrays as a dict with per-unit test keys.
    """
    subprocess.run(
        [sys.executable, "-c", _NCMAPSS_SCRIPT, str(root), str(window_size),
         str(stride), str(subsampling), str(out_npz)],
        check=True, timeout=600,
        env={**os.environ, "CUDA_VISIBLE_DEVICES": ""})
    raw = np.load(out_npz)
    out = {"train_x": raw["train_x"], "train_y": raw["train_y"],
           "test_x": {}, "test_y": {}, "max_rul": {}}
    for k in raw.files:
        for field in ("test_x", "test_y", "max_rul"):
            if k.startswith(field + "_"):
                unit = float(k[len(field) + 1:])
                out[field][unit] = raw[k]
    return out
