#!/usr/bin/env python
"""Generate tests/golden/models_golden.json from golden_builders.BUILDERS.

Run on CPU (the test environment) after any INTENDED architecture change:
    python tests/gen_golden_models.py [family ...]
Passing family names regenerates only those entries.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from golden_builders import BUILDERS, probe


def main():
    only = set(sys.argv[1:])
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "golden", "models_golden.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    golden = {}
    if os.path.exists(path):
        with open(path) as f:
            golden = json.load(f)
    for name, fn in BUILDERS.items():
        if only and name not in only:
            continue
        out = fn()
        golden[name] = probe(out)
        print(f"{name:<16} size={golden[name]['size']} "
              f"mean={golden[name]['mean']:+.6f}")
    with open(path, "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
