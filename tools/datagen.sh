#!/bin/bash
# Regenerate the 26k synthetic cabinet dataset at /root/data (ephemeral
# between rounds; deterministic seeds so splits match earlier rounds).
# ~16 min on the 1-core host. Usage: bash tools/datagen.sh [count] [root]
set -e
COUNT=${1:-26000}
ROOT=${2:-/root/data}
cd "$(dirname "$0")/.."

python tools/generate_models.py --root "$ROOT" --count "$COUNT" --seed 0

for dt in complete visible noise_05 noise_10 visible_noise_05 visible_noise_10; do
  python tools/render_svgs.py --root "$ROOT" --data_type "$dt"
  python tools/prepare_info.py --data_path "$ROOT" --data_type "$dt"
done
echo "datagen done: $ROOT"
