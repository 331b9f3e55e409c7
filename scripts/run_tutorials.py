"""Execute every tutorial notebook's code cells in-process (CPU platform).

Keeps the tutorials honest: they are product surface, not prose. Run:
  CURL_TPU_PLATFORM=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/run_tutorials.py [name-filter]
"""

import json
import os
import sys
import time

os.environ.setdefault("CURL_TPU_PLATFORM", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TUTORIALS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "tutorials")


def run_notebook(path):
    with open(path) as f:
        nb = json.load(f)
    ns = {"__name__": "__main__"}
    for i, cell in enumerate(nb["cells"]):
        if cell["cell_type"] != "code":
            continue
        src = "".join(cell["source"])
        exec(compile(src, f"{os.path.basename(path)}:cell{i}", "exec"), ns)


def main():
    pattern = sys.argv[1] if len(sys.argv) > 1 else ""
    failures = []
    for name in sorted(os.listdir(TUTORIALS)):
        if not name.endswith(".ipynb") or pattern not in name:
            continue
        t0 = time.time()
        try:
            run_notebook(os.path.join(TUTORIALS, name))
            print(f"PASS {name} ({time.time() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001
            import traceback

            traceback.print_exc()
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            failures.append(name)
    if failures:
        raise SystemExit(f"failed: {failures}")
    print("all tutorials pass")


if __name__ == "__main__":
    main()
