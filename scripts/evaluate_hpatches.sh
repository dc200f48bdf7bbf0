#!/bin/bash
# Run the matching pipeline over HPatches sequences and score MMA@1-15px
# (parity: reference scripts flow -> evaluation.py + eval_hpatches.py).
# Usage: evaluate_hpatches.sh <hpatches_root> <results_dir>
python - "$@" <<'PY'
import sys
from oetr_tpu.pipelines import build_model
from oetr_tpu.pipelines.runner import run_benchmark
from oetr_tpu.evalx import hpatches
from oetr_tpu.evalx.datasets import (generate_hpatches_pairs,
                                     iter_hpatches_results)

root, results = sys.argv[1:3]
pairs_txt = f"{results}/hpatches_pairs.txt"
n = generate_hpatches_pairs(root, pairs_txt)
print(f"pairs: {n}")
model, conf = build_model("superpoint_aachen", "superglue_outdoor",
                          overlaper=None)
stats = run_benchmark(model, pairs_txt, root, results,
                      with_overlap=False, pairwise=False)
print("run:", stats)
table = hpatches.benchmark_results(
    list(iter_hpatches_results(pairs_txt, root, results)))
for k, v in table.items():
    print(f"{k}: {v}")
PY
