#!/bin/bash
# Regenerate tests/goldens/ from the compiled reference (terifan/OCR at /root/reference).
# Test-time tooling only; the produced JSON/PNGs are committed so CI never needs Java.
set -euo pipefail

REF=/root/reference
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
BUILD=$(mktemp -d)
GOLD="$REPO/tests/goldens"
mkdir -p "$GOLD"

javac -nowarn -encoding UTF-8 -d "$BUILD" $(find "$REF/src" -name '*.java')
javac -nowarn -encoding UTF-8 -cp "$BUILD" -d "$BUILD" "$REPO/tools/java_oracle/GoldenDump.java"

J="java -Djava.awt.headless=true -cp $BUILD org.terifan.ocr.GoldenDump"

# canonical gray rasters (Java2D color conversion, Bitmap.java:26-42)
$J gray "$REF/src/org/terifan/ocr/fonts/arial.png"   "$GOLD/arial.gray.png"
$J gray "$REF/src/org/terifan/ocr/fonts/courier.png" "$GOLD/courier.gray.png"

# learned alphabet features (CurvatureClassifier.java:45-79)
$J alphabet "$REF/src/org/terifan/ocr/fonts/arial.png"   arial   "$GOLD/alphabet_arial.json"
$J alphabet "$REF/src/org/terifan/ocr/fonts/courier.png" courier "$GOLD/alphabet_courier.json"

# full-page scans: spacing=8px, pad=10 (fixed golden protocol)
for i in 0 1 2 3 4 5 6 7 8 9; do
  $J scan "$REF/src/org/terifan/ocr/simple/$i.png" 8 10 "$GOLD/scan_simple_$i.json"
done
for i in 1 2 3 4 5 6 7 8 9; do
  $J scan "$REF/src/org/terifan/ocr2/test_string_$i.png" 8 10 "$GOLD/scan_string_$i.json"
done

rm -rf "$BUILD"
echo "goldens written to $GOLD"
