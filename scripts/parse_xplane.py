"""Parse a jax.profiler xplane trace into a per-op self-time breakdown.

Usage: python scripts/parse_xplane.py <tracedir> <outdir>
Needs PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python (the baked-in
tensorboard_plugin_profile ships stale _pb2 stubs).
"""

import glob
import json
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

tracedir, outdir = sys.argv[1], sys.argv[2]
xplanes = glob.glob(os.path.join(tracedir, "**", "*.xplane.pb"), recursive=True)
print("xplanes:", xplanes)

from xprof.convert import raw_to_tool_data as rtd

for tool in ("framework_op_stats", "op_profile"):
    try:
        data, _ = rtd.xspace_to_tool_data(xplanes, tool, {"tqx": "out:json"})
        if isinstance(data, bytes):
            data = data.decode()
        path = os.path.join(outdir, tool + ".json")
        with open(path, "w") as f:
            f.write(data if isinstance(data, str) else json.dumps(data))
        print("wrote", path, len(data))
    except Exception as e:
        print(tool, "failed:", repr(e))
