#!/bin/bash
# Interleaved same-box A/B for the countmin/minhash/hll/lm_score jitter
# family (r12 verdict item 5): the four queries have been flagged as
# close-vs-close movers in r10, r11, and r12, each time re-measured as
# host noise. This settles it with the stream-join method from r12: run
# old-HEAD (worktree) and current-HEAD binaries ALTERNATELY on one box, N
# rounds each, same protocol (ProfileQuery: clearCache before every
# iteration, checksum force). If the two builds' per-query bands overlap,
# the family is host jitter by construction — same code epoch, same box,
# interleaved so no epoch drift can masquerade as a code delta.
#
# Usage: tools/jitter_ab.sh [rounds] [iters-per-round]
# Env:   AB_WT=<worktree dir> AB_WT_COMMIT=<expected short sha> to point
#        side A at a different pinned binary.
set -euo pipefail
ROUNDS=${1:-4}
ITERS=${2:-3}
QUERIES=${AB_QUERIES:-q_lm_score,q_countmin,q_minhash_dedup,q_hll_det}
SF=/root/testdata/sf0.1
WT=${AB_WT:-/root/repo/.wt-r12}
WT_COMMIT=${AB_WT_COMMIT:-7daf364}
A=$WT/target/scala-2.13/classes   # side A: pinned old HEAD (worktree)
B=/root/repo/target/scala-2.13/classes           # side B: current HEAD
LOGDIR=${AB_LOGDIR:-/tmp/jitter_ab_logs}
mkdir -p "$LOGDIR"
# Fail fast on a wrong or missing A binary (ADVICE r13): a rebuilt or
# absent worktree would silently benchmark the wrong "old" side.
[ -d "$A" ] || { echo "FATAL: side-A classpath $A missing" >&2; exit 2; }
[ -d "$B" ] || { echo "FATAL: side-B classpath $B missing" >&2; exit 2; }
wt_head=$(git -C "$WT" rev-parse --short HEAD)
case "$wt_head" in
  "$WT_COMMIT"*) ;;
  *) echo "FATAL: worktree $WT is at $wt_head, expected $WT_COMMIT — side A would be mislabeled" >&2
     exit 2 ;;
esac
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
for r in $(seq 1 "$ROUNDS"); do
  for side in A B; do
    cp=$([ "$side" = A ] && echo "$A" || echo "$B")
    echo "== round $r side $side"
    log="$LOGDIR/${side}_r${r}.log"
    # Full java output goes to a per-round log (ADVICE r13 — was
    # 2>/dev/null, so a crashed run aborted the whole interleave with no
    # diagnostic); a round with no profile lines is REPORTED, not fatal.
    # shellcheck disable=SC2086
    java -Xmx8g $OPENS -cp "$cp:/opt/spark/jars/*" \
      graft.tools.ProfileQuery "$SF" "$QUERIES" "$ITERS" >"$log" 2>&1 || true
    grep -E "^\[profile\]" "$log" | sed "s/^/[$side r$r] /" \
      || echo "[$side r$r] NO PROFILE OUTPUT — see $log"
  done
done
