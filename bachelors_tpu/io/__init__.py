from .config import SimConfig, load_config, parse_config, parse_ini
from .snapshot import BinSnapshot, load_bin_maps, make_save_folder, save_bin_maps
from .stats_io import StatsAccumulator
