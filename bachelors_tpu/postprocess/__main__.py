"""Render a run folder's artifacts: frames + stats plots.

Usage:
    python -m bachelors_tpu.postprocess RUN_FOLDER [--out OUTDIR]

The operational analog of the reference's plot.py workflow: load every
maps_NNNN.bin, render temperature+interface figures, and plot the stats
CSV if present.
"""
import argparse
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_folder")
    ap.add_argument("--out", default=None)
    ap.add_argument("--map", default="U", help="background field (default U)")
    args = ap.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")

    from .loaders import list_run_snapshots, load_snapshot, load_stats_csv
    from .plots import (plot_delta_norms, plot_step_residuals,
                        plot_temperature_interface)

    out = args.out or os.path.join(args.run_folder, "rendered")
    os.makedirs(out, exist_ok=True)

    frames = list_run_snapshots(args.run_folder)
    if not frames:
        print(f"no maps_*.bin in {args.run_folder}", file=sys.stderr)
        return 1
    for path in frames:
        snap = load_snapshot(path)
        if "F" not in snap.maps:
            continue
        bg = snap.maps.get(args.map, snap.maps["F"])
        name = os.path.splitext(os.path.basename(path))[0]
        L0 = snap.dx * snap.nx
        plot_temperature_interface(bg, snap.maps["F"], L0,
                                   save=os.path.join(out, f"{name}.png"))
        print(f"rendered {name}.png (t={snap.time:g} iter={snap.iter})")

    stats_path = os.path.join(args.run_folder, "stats.csv")
    if os.path.exists(stats_path):
        table = load_stats_csv(stats_path)
        if len(table["time"]):
            plot_delta_norms(table, save=os.path.join(out, "delta_norms.png"))
            if table.step_res_count:
                plot_step_residuals(table,
                                    save=os.path.join(out, "step_residuals.png"))
            print("rendered stats plots")
    return 0


if __name__ == "__main__":
    sys.exit(main())
