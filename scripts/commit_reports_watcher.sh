#!/bin/bash
# Auto-commit campaign report JSONs as they land (CLAUDE.md round-3 ops:
# gitignored campaign state is ephemeral across rounds — the committed
# reports/*.json are the only durable quality evidence, so commit each
# aggregation as soon as the campaign writes it).
#
# Usage: commit_reports_watcher.sh <report-path> [poll-seconds] [max-seconds]
# Exits when /tmp/stop_reports_watcher exists or after max-seconds (default 2h).
set -u
cd /root/repo
REPORT=${1:-reports/quality_v2_c4.json}
POLL=${2:-60}
END=$(( $(date +%s) + ${3:-7200} ))
# Derive the campaign tag from the report filename (quality_v2_<tag>.json),
# so round-4 reports are not mislabeled "Campaign c4" (ADVICE.md round 3).
TAG=$(basename "$REPORT" .json); TAG=${TAG#quality_v2_}
rm -f /tmp/stop_reports_watcher
while [ "$(date +%s)" -lt "$END" ] && [ ! -e /tmp/stop_reports_watcher ]; do
  # porcelain is non-empty iff the file differs from HEAD (or is untracked)
  if [ -f "$REPORT" ] && [ -n "$(git status --porcelain -- "$REPORT")" ]; then
    git add -- "$REPORT" && \
      git commit -q -m "Campaign $TAG: update $(basename "$REPORT")" \
        -- "$REPORT" 2>/dev/null && \
      echo "committed $REPORT @ $(date -u +%H:%M:%S)"
  fi
  sleep "$POLL"
done
