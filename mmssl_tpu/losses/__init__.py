from mmssl_tpu.losses.bpr import bpr_loss  # noqa: F401
from mmssl_tpu.losses.contrastive import infonce  # noqa: F401
from mmssl_tpu.losses.reg import feat_reg_loss  # noqa: F401
