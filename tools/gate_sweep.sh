#!/usr/bin/env bash
# 4-SF oracle gate sweep for a key subset (or the full surface).
#
#   tools/gate_sweep.sh '^q_my_new_key$'      # one key, all four SFs
#   tools/gate_sweep.sh                       # every key, all four SFs
#
# Runs graft.Verify + tools/local_oracle.py at sf0.001/0.01/0.1 (driver
# testdata) and sf1 (/tmp/testdata/sf1 — generate with tools/gen_sf1.py).
# Exits non-zero on the first failing scale factor. sbt runs serially
# (one global lock), so this is the whole-round proof loop in one command.
set -u -o pipefail
KEYS="${1:-}"
for d in /root/testdata/sf0.001 /root/testdata/sf0.01 /root/testdata/sf0.1 /tmp/testdata/sf1; do
  if [ ! -d "$d" ]; then echo "[sweep] SKIP $d (missing — run tools/gen_sf1.py for sf1)"; continue; fi
  out="/tmp/gate_sweep_$(basename "$d")"
  echo "[sweep] $d -> $out"
  # grep exits 1 when the (expected-absent) failure line never appears, so
  # test PIPESTATUS[0] (sbt itself) explicitly instead of `|| true`-masking.
  if [ -n "$KEYS" ]; then
    SPARK_GRAFT_KEYS="$KEYS" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
      sbt -batch "runMain graft.Verify $d $out" 2>&1 | grep -E '\[verify\].*failed|\[error\]'
  else
    SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
      sbt -batch "runMain graft.Verify $d $out" 2>&1 | grep -E '\[verify\].*failed|\[error\]'
  fi
  SBT_RC=${PIPESTATUS[0]}
  [ "$SBT_RC" -ne 0 ] && { echo "[sweep] FAILED at $d (sbt rc=$SBT_RC)"; exit 1; }
  [ -f "$out/oracle_sql.json" ] || { echo "[sweep] FAILED at $d (no oracle_sql.json — Verify never wrote)"; exit 1; }
  # pipefail makes local_oracle's exit 1 (any key FAIL) survive the tail
  python3 tools/local_oracle.py "$d" "$out" | tail -1 || { echo "[sweep] FAILED at $d"; exit 1; }
done
echo "[sweep] all scale factors green"
exit 0
