#!/usr/bin/env bash
# Batch-process every folder listed in folders.txt (the analog of the
# reference's scripts/run_from_txt.sh — minus its stale '-o' flag, which
# the reference CLI itself does not accept). Per-folder failures are
# isolated and reported at the end by the CLI's --from-file mode.
set -euo pipefail
LIST="${1:-folders.txt}"
python -m deepfly3d_tpu.cli "$LIST" -f -vv -n 100
