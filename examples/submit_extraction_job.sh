#!/usr/bin/env bash
# Submit the extraction pipeline as a Ray job on a running cluster — the
# production launch path (north_rule: "run via ray job submit on a
# fixed-size multi-node Ray cluster").
#
#   RAY_ADDRESS=http://<head>:8265 ./examples/submit_extraction_job.sh \
#       /data/interleaved_docs /data/ctdray_out
#
# The entrypoint is examples/run_extraction.py, which is idempotent: the
# per-chunk checkpoint manifest in $OUT skips finished partitions, so
# re-submitting the identical job after a failure resumes where it left
# off.  Requires `ray[default]` on the submitting machine (the jobs CLI
# ships with the dashboard extra; this sandbox has ray[data] only, so the
# command below is exercised on real clusters, not in CI here).
set -euo pipefail

INPUT="${1:?usage: submit_extraction_job.sh INPUT_DIR OUT_DIR [BACKEND]}"
OUT="${2:?usage: submit_extraction_job.sh INPUT_DIR OUT_DIR [BACKEND]}"
BACKEND="${3:-torch}"

exec ray job submit \
  --working-dir "$(dirname "$0")/.." \
  --runtime-env-json '{"excludes": [".git", "tests", "/root/testdata"]}' \
  -- python examples/run_extraction.py \
       --input "$INPUT" --out "$OUT" --backend "$BACKEND"
