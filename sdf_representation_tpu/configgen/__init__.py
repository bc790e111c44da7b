from .config_reader import Configuration
