#!/bin/bash
# Interleaved same-box A/B for the countmin/minhash/hll/lm_score jitter
# family (r12 verdict item 5): the four queries have been flagged as
# close-vs-close movers in r10, r11, and r12, each time re-measured as
# host noise. This settles it with the stream-join method from r12: run
# r12-HEAD (worktree) and r13-HEAD binaries ALTERNATELY on one box, N
# rounds each, same protocol (ProfileQuery: clearCache before every
# iteration, checksum force). If the two builds' per-query bands overlap,
# the family is host jitter by construction — same code epoch, same box,
# interleaved so no epoch drift can masquerade as a code delta.
#
# Usage: tools/jitter_ab.sh [rounds] [iters-per-round]
set -euo pipefail
ROUNDS=${1:-4}
ITERS=${2:-3}
QUERIES=q_lm_score,q_countmin,q_minhash_dedup,q_hll_det
SF=/root/testdata/sf0.1
A=/root/repo/.wt-r12/target/scala-2.13/classes   # r12 HEAD (7daf364)
B=/root/repo/target/scala-2.13/classes           # r13 HEAD
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
for r in $(seq 1 "$ROUNDS"); do
  for side in A B; do
    cp=$([ "$side" = A ] && echo "$A" || echo "$B")
    echo "== round $r side $side"
    # shellcheck disable=SC2086
    java -Xmx8g $OPENS -cp "$cp:/opt/spark/jars/*" \
      graft.tools.ProfileQuery "$SF" "$QUERIES" "$ITERS" 2>/dev/null \
      | grep -E "^\[profile\]" | sed "s/^/[$side r$r] /"
  done
done
