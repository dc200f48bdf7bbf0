#!/bin/bash
# Run the overlap-guided pipeline over IMC-2021 val pairs and score it
# (parity: reference scripts/evaluate_imc.sh -> evaluation.py + eval_imc.py).
# Usage: evaluate_imc.sh <pairs.txt> <data_dir> <results_dir> [method]
python - "$@" <<'PY'
import sys
from oetr_tpu.pipelines import build_model
from oetr_tpu.pipelines.runner import run_benchmark
from oetr_tpu.evalx import imc

pairs, data, results = sys.argv[1:4]
method = sys.argv[4] if len(sys.argv) > 4 else "oetr_superpoint_superglue"
model, conf = build_model("superpoint_aachen", "superglue_outdoor",
                          overlaper="oetr")
stats = run_benchmark(model, pairs, data, results)
print("run:", stats)
datasets, aucs, prec, ms, mAA = imc.benchmark_results(
    pairs, results, pairwise=True,
    dynamic_threshold=imc.dynamic_threshold_for(method))
for d, a, p, m, maa in zip(datasets, aucs, prec, ms, mAA):
    print(f"{d:16s} auc@5/10/20 {a[0]:5.2f}/{a[1]:5.2f}/{a[2]:5.2f} "
          f"prec {p:5.2f} ms {m:5.2f} mAA@10 {maa:5.2f}")
PY
