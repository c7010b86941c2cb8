#!/usr/bin/env python
"""Convert LArCV2 ROOT files to this framework's HDF5 event schema.

The reference consumes LArCV2 (C++/ROOT) sparse tensor products directly
(SURVEY.md §2.15); ROOT is not available in this environment, so conversion
happens wherever larcv IS installed and training/inference here reads the
HDF5 (uresnet_pytorch_tpu/iotools/h5_io.py schema):

    python tools/larcv_to_h5.py input.root output.h5 \
        --keys sparse3d_data,sparse3d_fivetypes --spatial-size 512

Each --keys entry maps to an output group (first = 'data', second = 'label',
third = 'weight'), mirroring the reference's --data-keys semantics.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--keys", required=True,
                    help="comma list of larcv producer names (data[,label[,weight]])")
    ap.add_argument("--spatial-size", type=int, default=512)
    ap.add_argument("--data-dim", type=int, default=3)
    ap.add_argument("--limit", type=int, default=0)
    args = ap.parse_args()

    try:
        from larcv import larcv  # noqa: F401  (needs a ROOT+larcv install)
        from ROOT import TChain
    except ImportError as e:
        raise SystemExit(
            "larcv/ROOT not available in this environment — run this "
            "converter where LArCV2 is installed. The HDF5 schema it "
            "produces is documented in uresnet_pytorch_tpu/iotools/h5_io.py."
        ) from e

    producers = [k.strip() for k in args.keys.split(",")]
    canon = ["data", "label", "weight"][: len(producers)]
    chains = []
    for p in producers:
        c = TChain(f"sparse{args.data_dim}d_{p}_tree")
        c.AddFile(args.input)
        chains.append(c)
    n = int(chains[0].GetEntries())
    if args.limit:
        n = min(n, args.limit)

    events = {k: [] for k in canon}
    for i in range(n):
        for canon_key, p, c in zip(canon, producers, chains):
            c.GetEntry(i)
            ev = getattr(c, f"sparse{args.data_dim}d_{p}_branch")
            voxels = ev.as_vector()
            meta = ev.meta()
            m = voxels.size()
            coords = np.zeros((m, args.data_dim), np.int32)
            values = np.zeros((m,), np.float32)
            for j in range(m):
                v = voxels[j]
                pos = meta.id_to_xyz_index(v.id()) if args.data_dim == 3 \
                    else meta.id_to_xy_index(v.id())
                coords[j] = [int(p_) for p_ in pos]
                values[j] = v.value()
            events[canon_key].append((coords, values))

    from uresnet_pytorch_tpu.iotools.h5_io import write_events
    write_events(args.output, events, args.spatial_size, args.data_dim)
    print(f"wrote {n} events -> {args.output}")


if __name__ == "__main__":
    main()
