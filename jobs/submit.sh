#!/usr/bin/env bash
# Package networkit_spark as a --py-files zip and spark-submit a job.
#
#   jobs/submit.sh [--master URL] <job.py> [job args...]
#
# north_rule: "the full pipeline ships as spark-submit --py-files jobs on a
# multi-executor cluster". On a real cluster pass e.g.
#   --master yarn --deploy-mode cluster  (extra spark-submit args go through
# SPARK_SUBMIT_ARGS). Locally the default master is local[8].
set -euo pipefail

REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
MASTER="local[8]"
if [[ "${1:-}" == "--master" ]]; then
  MASTER="$2"; shift 2
fi
JOB="$1"; shift

# Build the wheel-style zip of the library (deterministic: sorted entries).
PYZIP="${TMPDIR:-/tmp}/networkit_spark_pyfiles.zip"
(cd "$REPO_ROOT" && python - "$PYZIP" <<'EOF'
import os, sys, zipfile
dest = sys.argv[1]
with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in sorted(os.walk("networkit_spark")):
        dirs.sort()
        for f in sorted(files):
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print(dest)
EOF
)

SPARK_SUBMIT="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')"

exec "$SPARK_SUBMIT" \
  --master "$MASTER" \
  --py-files "$PYZIP" \
  ${SPARK_SUBMIT_ARGS:-} \
  "$JOB" "$@"
