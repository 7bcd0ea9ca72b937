#!/bin/bash
# Detached dec10 runner: waits for the enc10-saved ciphertext pair, runs the
# 10-round homomorphic decryption (the second half of the reference's
# 22,146 s roundtrip, README.md:118-119), and self-records the artifact so
# a builder session that ends mid-run still lands the measurement.
# Usage: nohup setsid tools/run_dec10.sh &
#
# The chain depth MUST match the enc10 run that wrote the pair: pass
# AES_FHE_ENC10_LEVELS through (defaults to the bench default, 100) — a
# mismatched depth rebuilds a different params-keyed keyset and the load
# fails or decodes garbage.
set -u
cd /root/repo
CT=${AES_FHE_LOAD_CT:-/root/repo/.enc10_ct}
LEVELS=${AES_FHE_ENC10_LEVELS:-108}
SNAPS=${AES_FHE_SNAP_COUNT:-2}
OUT=${DEC10_OUT:-BENCH_dec10_r05.json}
for i in $(seq 1 720); do
  [ -f "$CT.hi.npz" ] && [ -f "$CT.lo.npz" ] && break
  sleep 10
done
if [ ! -f "$CT.hi.npz" ] || [ ! -f "$CT.lo.npz" ]; then
  echo "dec10 wrapper: incomplete ciphertext pair at $CT after 2h; giving up" >&2
  exit 1
fi
# give the enc10 process time to fully exit and release the chip
# (save_ciphertext is atomic-rename, so the files cannot be mid-write)
sleep 30
AES_FHE_BENCH_BUDGET=0 AES_FHE_LOAD_CT="$CT" AES_FHE_ENC10_LEVELS="$LEVELS" \
  AES_FHE_SNAP_COUNT="$SNAPS" \
  python bench.py dec10 > /tmp/dec10_run.log 2>&1
rc=$?
tail -1 /tmp/dec10_run.log > "$OUT"
if [ $rc -eq 0 ] && grep -q '"aes128_decrypt10_sec"' "$OUT"; then
  # bench.py exits 0 even on a failed roundtrip — only an artifact whose
  # JSON carries "correct": true closes the roundtrip claim.
  if grep -q '"correct": true' "$OUT"; then
    msg="Record the on-chip 10-round decryption (roundtrip exact)"
  else
    msg="Record an on-chip 10-round decryption run (correct:false — diagnostic)"
  fi
  git add "$OUT"
  git commit -q -m "$msg

Driver-reproducible via AES_FHE_LOAD_CT=<enc10 pair> \
AES_FHE_ENC10_LEVELS=$LEVELS AES_FHE_SNAP_COUNT=$SNAPS python bench.py dec10;
the second half of the
reference's 22,146 s roundtrip (reference README.md:118-119). Auto-recorded
by tools/run_dec10.sh at run completion; the correct flag in the JSON is
authoritative.

No-Verification-Needed: benchmark artifact JSON only"
fi
exit $rc
