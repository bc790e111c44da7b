from .losses import (
    LOSS_REGISTRY,
    get_loss_class,
    MSELoss,
    CustomSDFLoss,
    WeightedSmoothL2Loss,
    CombinedLoss,
    IGRLOSS,
    IGRLOSSPCD,
    RegularizedCustomSDFLoss,
    GaussBonnetLoss,
)
