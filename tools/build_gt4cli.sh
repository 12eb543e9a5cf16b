#!/bin/sh
# Build .gt4cli/glistcompare (the native CLI front-end, native/gt4cli.c).
# flock-guarded so concurrent CLIs never exec a torn binary; atomic
# publish via rename (same discipline as native_build.py's .so publish).
set -e
root=$(CDPATH= cd -- "$(dirname -- "$0")/.." && pwd)
mkdir -p "$root/.gt4cli"
exec 9>"$root/.gt4cli/.lock"
flock 9
src="$root/native/gt4cli.c"
out="$root/.gt4cli/glistcompare"
if [ -x "$out" ] && [ ! "$src" -nt "$out" ]; then exit 0; fi
cc -O2 -Wall -o "$out.tmp.$$" "$src" -ldl
mv "$out.tmp.$$" "$out"
ln -f "$out" "$root/.gt4cli/glistquery"
