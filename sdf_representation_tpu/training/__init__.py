from .checkpoint import save_checkpoint, load_checkpoint, latest_epoch_checkpoint
from .trainer import Trainer, make_train_step, make_epoch_fn
from .pcd_trainer import PointCloudTrainer
