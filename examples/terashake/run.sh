#!/bin/bash
# examples/terashake: the SCEC TeraShake configuration
# (600x300x84.4 km, planewithkinks kinematic rupture).  The SCEC CVM
# database is not shipped; this driver synthesizes a layered stand-in
# with tools/makecvm.py and runs the reference inputs.  Frequency and
# duration are reduced by default so the example completes on one
# chip; raise FREQ/END for production scale.
set -e
cd "$(dirname "$0")"
export PYTHONPATH="$(cd ../..; pwd)${PYTHONPATH:+:$PYTHONPATH}"
REF=${REF:-/root/reference/examples/terashake}
RUN=${RUN:-run}
FREQ=${FREQ:-0.0125}
END=${END:-4}
CELLS=${CELLS:-50}
rm -rf "$RUN"; mkdir -p "$RUN/in" "$RUN/out/stations" "$RUN/out/srctmp"

python - "$RUN" <<PY
from hercules_tpu.tools.makecvm import build_layered_cvm
import sys
layers = [[0.0, 1200.0, 500.0, 2000.0],
          [9375.0, 3500.0, 1800.0, 2400.0],
          [28125.0, 6000.0, 3464.0, 2700.0]]
n = build_layered_cvm(f"{sys.argv[1]}/tera_layers.e", 600000.0,
                      300000.0, 84375.0, 4687.5, layers,
                      origin_lat=34.5, origin_lon=-121.0)
print(f"layered CVM: {n} octants")
PY

python - "$REF" "$RUN" "$FREQ" "$END" "$CELLS" <<'PY'
import re, sys, numpy as np
ref, run, freq, end, cells = sys.argv[1:6]
phys = open(f"{ref}/physics.in").read()
phys = re.sub(r"source_directory\s*=\s*\S+", "source_directory = in/src",
              phys)
num = open(f"{ref}/numerical.in").read()
num = re.sub(r"simulation_wave_max_freq_hz\s*=\s*\S+",
             f"simulation_wave_max_freq_hz = {freq}", num)
num = re.sub(r"^simulation_end_time_sec\s*=\s*\S+",
             f"simulation_end_time_sec = {end}", num, flags=re.M)
num = re.sub(r"number_output_planes\s*=\s*\S+",
             "number_output_planes = 0", num)
open(f"{run}/in/physics.in", "w").write(phys)
open(f"{run}/in/numerical.in", "w").write(num)
import os
os.makedirs(f"{run}/in/src", exist_ok=True)
src = open(f"{ref}/sourceterashake/source.in").read()
src = src.replace("extended_cells_along_strike         = 1000",
                  f"extended_cells_along_strike         = {cells}")
src = src.replace("extended_cells_down_dip             = 75",
                  "extended_cells_down_dip             = 8")
open(f"{run}/in/src/source.in", "w").write(src)
# slip/rake need number_of_time_windows * down_dip * along_strike
# values (SourceModel._parse_plane; quakesource.c:3931-3983)
nwin = int(re.search(r"number_of_time_windows\s*=\s*(\d+)", src)
           .group(1))
rng = np.random.default_rng(0)
np.savetxt(f"{run}/in/src/slip.in",
           rng.uniform(0.5, 3.0, (nwin * 8, int(cells))))
np.savetxt(f"{run}/in/src/rake.in",
           np.full((nwin * 8, int(cells)), 107.0))
print("terashake inputs prepared")
PY

python -m hercules_tpu.cli "$RUN/tera_layers.e" "$RUN/in/physics.in" "$RUN/in/numerical.in"
