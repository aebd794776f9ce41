from .loaders import load_snapshot, load_stats_csv, list_run_snapshots
from .interface import (extract_interface, interface_width, phase_l1_distance,
                        distance_table_latex)
from .colormap import science_colormap
