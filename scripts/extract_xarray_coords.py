"""Extract (class, subclass, stimulus) coordinates from an NSD-Synthetic
betas NetCDF into a sorted, de-duplicated CSV.

Reference parity: scripts/extract_xarray_coords.py — reads the
gifford2025.nsd_synthetic betas xarray, pulls the presentation-aligned
stimulus/subclass/class coordinates, keeps the first occurrence per
stimulus, and writes class,subclass,stimulus sorted ascending.
"""
from __future__ import annotations

import argparse
import os
import sys


def extract(nc_path: str, output_csv: str) -> "object":
    import pandas as pd
    import xarray as xr

    ds = xr.open_dataset(nc_path)
    if "betas" not in ds:
        raise KeyError(f"DataArray 'betas' not found in {nc_path}")
    betas = ds["betas"]
    for coord in ("stimulus", "subclass", "class"):
        if coord not in ds.coords:
            raise KeyError(f"Coordinate '{coord}' not found in {nc_path}")

    df = pd.DataFrame({
        "class": ds["class"].sel(presentation=betas.presentation).values,
        "subclass": ds["subclass"].sel(presentation=betas.presentation).values,
        "stimulus": ds["stimulus"].sel(presentation=betas.presentation).values,
    })
    df = df.drop_duplicates(subset=["stimulus"], keep="first")
    df = df.sort_values(["class", "subclass", "stimulus"])
    df.to_csv(output_csv, index=False)
    print(f"{len(df)} unique stimuli -> {output_csv}")
    return df


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="betas .nc file")
    p.add_argument("--output", default="datasets/neural/nsd_synthetic/extracted_coords.csv")
    args = p.parse_args(argv)
    if not os.path.exists(args.input):
        print(f"Error: {args.input} not found", file=sys.stderr)
        sys.exit(1)
    extract(args.input, args.output)


if __name__ == "__main__":
    main()
