from knp_emi_cgx_tpu.models.ionic import (  # noqa: F401
    IonicModel,
    PassiveModel,
    HodgkinHuxley,
    ATPPump,
    NeuronalCotransporters,
    GlialCotransporters,
    KirNaKPumpModel,
)
from knp_emi_cgx_tpu.models.gating import rush_larsen_update, forward_euler_update  # noqa: F401
