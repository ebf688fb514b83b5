"""Regenerate QUERY_HASHES.json — the per-query source fingerprints the
rotation uses to re-surface modified-but-already-sampled queries into the
driver's fresh-50 prefix (registry._modified_since_sampled).

Run after the full oracle-diff suite is green so the snapshot only ever
records verified states:

    PYTHONPATH=. python scripts/gen_query_hashes.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hhs_and_cms_data_pipeline_spark.registry import all_specs, spec_fingerprint


def main() -> None:
    specs = all_specs()
    hashes = {n: spec_fingerprint(s) for n, s in sorted(specs.items())}
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "QUERY_HASHES.json",
    )
    with open(out, "w") as fh:
        json.dump(hashes, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {len(hashes)} fingerprints to {out}")


if __name__ == "__main__":
    main()
