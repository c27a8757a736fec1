#!/usr/bin/env bash
# Google-Drive model/data fetcher — capability parity with the reference's
# gd.sh (confirm-token cookie flow for large files), written fresh.
#
# Usage: tools/fetch_gdrive.sh <FILE_ID> <OUTPUT_PATH>
#
# Requires network egress (not available in the build sandbox; run on a
# connected machine). Checkpoints fetched as torch .pth load directly via
# ssunet_gan_tpu.compat.load_torch_checkpoint.

set -euo pipefail

if [ $# -ne 2 ]; then
  echo "usage: $0 <gdrive-file-id> <output-path>" >&2
  exit 1
fi

FILE_ID="$1"
OUT="$2"
COOKIES="$(mktemp)"
trap 'rm -f "$COOKIES"' EXIT

BASE="https://docs.google.com/uc?export=download"

# First request sets the warning cookie for large files; extract the token.
TOKEN=$(wget --quiet --save-cookies "$COOKIES" --keep-session-cookies \
  --no-check-certificate "${BASE}&id=${FILE_ID}" -O - \
  | sed -rn 's/.*confirm=([0-9A-Za-z_]+).*/\1/p' | head -n1 || true)

if [ -n "${TOKEN}" ]; then
  URL="${BASE}&confirm=${TOKEN}&id=${FILE_ID}"
else
  URL="${BASE}&id=${FILE_ID}"
fi

wget --quiet --load-cookies "$COOKIES" --no-check-certificate "$URL" -O "$OUT"
echo "fetched ${FILE_ID} -> ${OUT}"
