#!/bin/bash
# Run a command only in a quiet host window: waits for /proc/stat steal to
# stay under the threshold, runs the command, re-checks steal afterwards;
# retries (up to N attempts) if the window was polluted. Prints the command
# output of the LAST (clean) attempt only.
# Usage: quietrun.sh <max_attempts> <steal_pct_threshold> -- cmd args...
set -u
ATTEMPTS=$1; THR=$2; shift 3
steal() { awk '/^cpu /{print $6, $2+$3+$4+$5+$6+$7+$8+$9}' /proc/stat; }
for a in $(seq 1 "$ATTEMPTS"); do
  # wait for a quiet 5s window
  for w in $(seq 1 60); do
    read s0 t0 < <(steal); sleep 5; read s1 t1 < <(steal)
    st=$(awk -v a=$s0 -v b=$s1 -v c=$t0 -v d=$t1 'BEGIN{print (d>c)?100*(b-a)/(d-c):0}')
    ok=$(awk -v s=$st -v t=$THR 'BEGIN{print (s<=t)?1:0}')
    [ "$ok" = 1 ] && break
  done
  read s0 t0 < <(steal)
  OUT=$("$@" 2>/dev/null)
  RC=$?
  read s1 t1 < <(steal)
  st=$(awk -v a=$s0 -v b=$s1 -v c=$t0 -v d=$t1 'BEGIN{print (d>c)?100*(b-a)/(d-c):0}')
  ok=$(awk -v s=$st -v t=$THR 'BEGIN{print (s<=t)?1:0}')
  if [ "$ok" = 1 ] && [ "$RC" = 0 ]; then
    echo "$OUT"
    echo "QUIET_OK steal=$st attempt=$a" >&2
    exit 0
  fi
  echo "RETRY attempt=$a steal=$st rc=$RC" >&2
done
echo "$OUT"
echo "QUIET_FAIL steal=$st" >&2
exit 0
