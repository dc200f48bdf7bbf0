#!/bin/bash
# Run the overlap-guided pipeline over MegaDepth-1500 pairs and score it
# (parity: reference scripts/evaluate_megadepth.sh -> evaluation.py +
# eval_megadepth.py).
python - "$@" <<'PY'
import sys
from oetr_tpu.pipelines import build_model
from oetr_tpu.pipelines.runner import run_benchmark
from oetr_tpu.evalx import megadepth

pairs, data, results = sys.argv[1:4]
model, conf = build_model("superpoint_aachen", "superglue_outdoor",
                          overlaper="oetr")
stats = run_benchmark(model, pairs, data, results)
print("run:", stats)
aucs, prec, ms = megadepth.benchmark_results(pairs, results, pairwise=True)
print(megadepth.summary_table({"oetr_superpoint_superglue": [aucs, prec, ms]}))
PY
