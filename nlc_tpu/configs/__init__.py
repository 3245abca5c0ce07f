from .config import ConfigDict, load_yaml_config, dump_args, load_args
from .presets import apply_method_preset, apply_dataset_defaults, METHODS
