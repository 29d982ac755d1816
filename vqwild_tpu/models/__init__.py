from vqwild_tpu.models.arv import ARVModel, ModelOutput, build_model, init_model
from vqwild_tpu.models.resnet_f2f import ResNet18F2F

__all__ = ["ARVModel", "ModelOutput", "build_model", "init_model", "ResNet18F2F"]
