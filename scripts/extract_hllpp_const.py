"""One-off: pack the published HLL++ empirical bias tables into an npz.

The numbers are the public companion data of Heule, Nunkesser &
Hall, "HyperLogLog in Practice" (EDBT 2013) — Google released the
raw-estimate/bias vectors for precisions 4-18; the reference library
ships the same constants (datasketch/hyperloglog_const.py). They are
data, not code; stored here as a binary asset with this provenance
note. Run: python scripts/extract_hllpp_const.py
"""

import importlib.util
import numpy as np

spec = importlib.util.spec_from_file_location(
    "hllconst", "/root/reference/datasketch/hyperloglog_const.py"
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

out = {"thresholds": np.asarray(mod._thresholds, dtype=np.float64)}
for i, (re_arr, b_arr) in enumerate(zip(mod._raw_estimate, mod._bias)):
    p = i + 4
    out[f"raw_estimate_p{p}"] = np.asarray(re_arr, dtype=np.float64)
    out[f"bias_p{p}"] = np.asarray(b_arr, dtype=np.float64)

np.savez_compressed("/root/repo/raydedup/data/hllpp_bias.npz", **out)
print("wrote", len(out), "arrays")
