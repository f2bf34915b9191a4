"""Build nsd_data.pkl (all 8 subjects × ROIs) in the framework's format.

Reference parity: scripts/preprocess_data/preprocess_nsd.py:52-158 —
the reference streams GLMsingle betas through bonner-libraries ROI
masks and repetition-averages into xarray DataArrays. This builder
covers two paths:

  * --convert: convert a reference-format pickle (xarray DataArrays)
    into the plain-dict format {"stimulus": [ids], "values": (n, v)}
    that visreps_tpu.data.neural.ResponseArray reads without xarray.
  * --from-npz: assemble nsd_data.pkl from per-(region, subject) .npz
    files named {region}_subj{idx}.npz containing 'stimulus' and
    'values' arrays (repetition-averaged betas), plus a shared_ids.npy.
"""
from __future__ import annotations

import argparse
import os
import pickle


def convert_reference_pickle(in_path: str, out_path: str) -> None:
    import numpy as np

    with open(in_path, "rb") as f:
        nsd = pickle.load(f)  # requires xarray installed for unpickling
    data = {}
    for region, by_subj in nsd["data"].items():
        data[region] = {}
        for subj, xr_arr in by_subj.items():
            data[region][subj] = {
                "stimulus": [int(s) for s in np.asarray(xr_arr.coords["stimulus"].values)],
                "values": np.asarray(xr_arr.values, np.float32),
            }
    out = {"shared_ids": set(int(s) for s in nsd["shared_ids"]), "data": data}
    with open(out_path, "wb") as f:
        pickle.dump(out, f)
    print(f"Converted {in_path} -> {out_path}")


def build_from_npz(npz_dir: str, shared_ids_path: str, out_path: str) -> None:
    import numpy as np

    shared_ids = set(int(s) for s in np.load(shared_ids_path))
    data: dict = {}
    for fname in sorted(os.listdir(npz_dir)):
        if not fname.endswith(".npz") or "_subj" not in fname:
            continue
        region, subj_part = fname[:-4].rsplit("_subj", 1)
        subj = int(subj_part)
        z = np.load(os.path.join(npz_dir, fname))
        data.setdefault(region, {})[subj] = {
            "stimulus": [int(s) for s in z["stimulus"]],
            "values": z["values"].astype(np.float32),
        }
        print(f"  {region} subj {subj}: {z['values'].shape}")
    with open(out_path, "wb") as f:
        pickle.dump({"shared_ids": shared_ids, "data": data}, f)
    print(f"Saved {out_path}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("convert", help="reference xarray pickle -> plain-dict pickle")
    c.add_argument("input")
    c.add_argument("output")
    b = sub.add_parser("from-npz", help="assemble from per-(region,subject) npz files")
    b.add_argument("--npz-dir", required=True)
    b.add_argument("--shared-ids", required=True)
    b.add_argument("--out", required=True)
    args = parser.parse_args(argv)

    if args.cmd == "convert":
        convert_reference_pickle(args.input, args.output)
    else:
        build_from_npz(args.npz_dir, args.shared_ids, args.out)


if __name__ == "__main__":
    main()
