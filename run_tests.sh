#!/usr/bin/env bash
# Test suite, split into two shards that each fit a 10-minute cap on the
# single-core host (warm XLA cache at /tmp/shapy_tpu_xla_cache_$(uname -n)).
#
#   ./run_tests.sh 1   # heavy shard: big XLA graphs (vision/train/driver)
#   ./run_tests.sh 2   # everything else
#   ./run_tests.sh     # both, sequentially
set -e
cd "$(dirname "$0")"

HEAVY="tests/test_vision.py tests/test_regressor.py tests/test_train.py \
tests/test_trainer.py tests/test_evaluate_cli.py \
tests/test_graft_interface.py"

IGNORES=""
for f in $HEAVY; do IGNORES="$IGNORES --ignore=$f"; done

case "${1:-all}" in
  1) python -m pytest $HEAVY -q ;;
  2) python -m pytest tests/ $IGNORES -q ;;
  all) python -m pytest tests/ $IGNORES -q && python -m pytest $HEAVY -q ;;
  *) echo "usage: $0 [1|2]"; exit 2 ;;
esac
