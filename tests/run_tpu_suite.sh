#!/bin/sh
# Hardware test suite: TAT_TPU_TESTS=1 with per-file process isolation.
#
# The tunneled TPU runtime can wedge after an unsupported-op error
# (e.g. complex64 device ops in the audio STFT tests) and then fail
# every subsequent dispatch in the same process with
# "UNIMPLEMENTED: TPU backend error". Running each test file in its
# own process contains the blast radius; the per-file results are what
# count. (Verified: tests that "failed" in a poisoned process pass in
# isolation.)
set -u
cd "$(dirname "$0")/.."
pass=0; fail=0; failed_files=""
for f in tests/test_*.py; do
    echo "== $f =="
    if TAT_TPU_TESTS=1 timeout 2400 python -m pytest "$f" -q; then
        pass=$((pass+1))
    else
        fail=$((fail+1)); failed_files="$failed_files $f"
    fi
done
echo "files: $pass passed, $fail failed:$failed_files"
[ "$fail" -eq 0 ]
