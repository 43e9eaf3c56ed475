from .resnet import ResNet, Backbone, FrozenBatchNorm, frozen_bn_mask  # noqa: F401
