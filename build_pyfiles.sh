#!/usr/bin/env bash
# Package pyobo_spark for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")"
mkdir -p dist
rm -f dist/pyobo_spark.zip
python -c "
import zipfile, pathlib
root = pathlib.Path('pyobo_spark')
with zipfile.ZipFile('dist/pyobo_spark.zip', 'w', zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.rglob('*.py')):
        z.write(p, p)
print('dist/pyobo_spark.zip written')
"
