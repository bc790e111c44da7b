from .constants import RANDOM_SEED_TEST_SPLIT, RANDOM_SEED_DATA_GENERATION
from .files import create_directory
