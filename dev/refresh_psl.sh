#!/bin/bash
# Re-vendor src/main/resources/graft/public_suffix_list.dat.
#
# The vendored PSL is a STATIC SNAPSHOT (currently the 2022-11-29 copy
# redistributed inside Apache HttpClient 4.5.14 — this build box has
# zero egress, so the jar on the Spark classpath is the freshest public
# copy available locally). PSL rules change on the order of dozens of
# edits per month upstream; a production deployment should refresh on
# its own cadence (quarterly is typical for crawl pipelines) and MUST
# keep the provenance header below in sync with the new source + date.
#
# Usage:
#   dev/refresh_psl.sh                      # re-extract from the local jar
#   dev/refresh_psl.sh /path/to/list.dat    # vendor a freshly downloaded
#                                           # upstream file (preferred when
#                                           # egress exists:
#   curl -fsSL https://publicsuffix.org/list/public_suffix_list.dat)
#
# After refreshing: update the "dated" line in the header if the source
# changed, then rerun `sbt test` — PslPropertySpec + the t16/t17 oracle
# rows gate the loader against the new snapshot.
set -euo pipefail
cd "$(dirname "$0")/.."
DEST=src/main/resources/graft/public_suffix_list.dat
SRC="${1:-}"
TMP=$(mktemp)
if [ -n "$SRC" ]; then
  cp "$SRC" "$TMP"
  ORIGIN="$SRC (manually supplied; record its retrieval date below)"
else
  JAR=$(ls /opt/spark/jars/httpclient-*.jar 2>/dev/null | head -1)
  [ -n "$JAR" ] || { echo "no httpclient jar found and no source file given" >&2; exit 1; }
  unzip -p "$JAR" mozilla/public-suffix-list.txt > "$TMP"
  ORIGIN="$JAR (mozilla/public-suffix-list.txt)"
fi
grep -q "===BEGIN ICANN DOMAINS===" "$TMP" || {
  echo "source does not look like a PSL file (no ICANN marker)" >&2; exit 1; }
# keep the provenance header (everything up to the first upstream MPL
# comment) from the current vendored copy, then splice the new body in
awk '/^\/\/ This Source Code Form/{exit} {print}' "$DEST" > "$DEST.new"
cat "$TMP" >> "$DEST.new"
mv "$DEST.new" "$DEST"
rm -f "$TMP"
echo "re-vendored from: $ORIGIN"
echo "REMINDER: update the snapshot date in the $DEST header, then run: sbt test"
