#!/bin/bash
# Auto-commit campaign report JSONs as they land (CLAUDE.md round-3 ops:
# gitignored campaign state is ephemeral across rounds — the committed
# reports/*.json are the only durable quality evidence, so commit each
# aggregation as soon as the campaign writes it).
#
# Usage: commit_reports_watcher.sh <report-path> [poll-seconds]
# Exits when /tmp/stop_reports_watcher exists or after 2h.
set -u
cd /root/repo
REPORT=${1:-reports/quality_v2_c4.json}
POLL=${2:-60}
END=$(( $(date +%s) + 7200 ))
rm -f /tmp/stop_reports_watcher
while [ "$(date +%s)" -lt "$END" ] && [ ! -e /tmp/stop_reports_watcher ]; do
  # porcelain is non-empty iff the file differs from HEAD (or is untracked)
  if [ -f "$REPORT" ] && [ -n "$(git status --porcelain -- "$REPORT")" ]; then
    git add -- "$REPORT" && \
      git commit -q -m "Campaign c4: update $(basename "$REPORT")" \
        -- "$REPORT" 2>/dev/null && \
      echo "committed $REPORT @ $(date -u +%H:%M:%S)"
  fi
  sleep "$POLL"
done
