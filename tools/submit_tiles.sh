#!/bin/sh
# Package the engine and run the tile job via spark-submit --py-files
# (north-rule execution mode). Usage: ./tools/submit_tiles.sh [n_docs] [res] [work_dir] [master]
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=/tmp/kml2geojson_spark_engine.zip
rm -f "$ZIP"
(cd "$REPO" && python -c "
import zipfile, pathlib
z = zipfile.ZipFile('$ZIP', 'w')
for p in pathlib.Path('kml2geojson_spark').rglob('*.py'):
    z.write(p, str(p))
z.close()
print('packaged', '$ZIP')
")
MASTER="${4:-local[8]}"
exec spark-submit --master "$MASTER" \
  --conf spark.sql.shuffle.partitions=32 \
  --conf spark.sql.adaptive.enabled=true \
  --py-files "$ZIP" \
  "$REPO/tools/job_tiles.py" "${1:-20000}" "${2:-8}" "${3:-/tmp/k2g_job}"
