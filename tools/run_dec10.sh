#!/bin/bash
# Detached dec10 runner: waits for the enc10-saved ciphertext pair, runs the
# 10-round homomorphic decryption (the second half of the reference's
# 22,146 s roundtrip, README.md:118-119), and self-records the artifact so
# a builder session that ends mid-run still lands the measurement.
# Usage: nohup setsid tools/run_dec10.sh &
set -u
cd /root/repo
CT=${AES_FHE_LOAD_CT:-/root/repo/.enc10_ct}
for i in $(seq 1 720); do
  [ -f "$CT.hi.npz" ] && [ -f "$CT.lo.npz" ] && break
  sleep 10
done
if [ ! -f "$CT.hi.npz" ]; then
  echo "dec10 wrapper: no ciphertext pair at $CT after 2h; giving up" >&2
  exit 1
fi
# give the enc10 process time to fully exit and release the chip
sleep 30
AES_FHE_BENCH_BUDGET=0 AES_FHE_LOAD_CT="$CT" \
  python bench.py dec10 > /tmp/dec10_run.log 2>&1
rc=$?
tail -1 /tmp/dec10_run.log > BENCH_dec10_r04.json
if [ $rc -eq 0 ] && grep -q '"aes128_decrypt10_sec"' BENCH_dec10_r04.json; then
  git add BENCH_dec10_r04.json
  git commit -q -m "Record the on-chip 10-round homomorphic decryption measurement

Driver-reproducible via AES_FHE_LOAD_CT=<enc10 pair> python bench.py dec10;
closes the encrypt->decrypt half of the reference's 22,146 s roundtrip
(reference README.md:118-119). Auto-recorded by tools/run_dec10.sh at run
completion.

No-Verification-Needed: benchmark artifact JSON only"
fi
exit $rc
