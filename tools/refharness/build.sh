#!/bin/bash
# Compile the PUBLIC reference (/root/reference) + dependency stubs +
# the Instrument harness into /tmp/refbuild/classes. Jars come from the
# pyspark distribution bundled in the container (JTransforms etc.).
set -euo pipefail
HERE="$(cd "$(dirname "$0")" && pwd)"
JARS=/root/.pyenv/versions/3.11.7/lib/python3.11/site-packages/pyspark/jars
CP="$JARS/JTransforms-3.1.jar:$JARS/JLargeArrays-1.5.jar:$JARS/commons-math3-3.6.1.jar:$JARS/kryo-shaded-4.0.3.jar"
OUT=/tmp/refbuild/classes
python "$HERE/gen_stubs.py"
rm -rf "$OUT" && mkdir -p "$OUT"
javac -nowarn -encoding UTF-8 -d "$OUT" -cp "$CP" \
  $(find "$HERE/stubs" "$HERE/src" /root/reference/src/main/java -name "*.java")
echo "classes in $OUT; run e.g.:"
echo "  java -cp $OUT:$CP sfa.classification.Instrument Beef grid"
