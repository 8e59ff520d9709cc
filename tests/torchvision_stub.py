"""Minimal torchvision stand-in for reference-parity tests.

This environment ships torch but not torchvision, while the reference
backbone imports ``resnet50`` / ``ResNet50_Weights`` /
``IntermediateLayerGetter`` (``/root/reference/models/backbone.py:8-9``).
``install()`` registers a faithful stand-in in ``sys.modules``: the standard
torchvision ResNet-50 v1.5 graph (stride on each bottleneck's 3x3 conv) with
exact torchvision parameter naming, randomly initialized — the zoo download
is skipped, which is fine because parity tests convert whatever weights the
torch model holds.
"""
from __future__ import annotations

import sys
import types
from collections import OrderedDict

import torch
from torch import nn


def _conv1x1(cin, cout, stride=1):
    return nn.Conv2d(cin, cout, 1, stride=stride, bias=False)


def _conv3x3(cin, cout, stride=1):
    return nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)


class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 norm_layer=nn.BatchNorm2d):
        super().__init__()
        self.conv1 = _conv1x1(inplanes, planes)
        self.bn1 = norm_layer(planes)
        self.conv2 = _conv3x3(planes, planes, stride)
        self.bn2 = norm_layer(planes)
        self.conv3 = _conv1x1(planes, planes * self.expansion)
        self.bn3 = norm_layer(planes * self.expansion)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _ResNet50(nn.Module):
    def __init__(self, norm_layer=nn.BatchNorm2d):
        super().__init__()
        self.inplanes = 64
        self._norm = norm_layer
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = norm_layer(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, 3, 1)
        self.layer2 = self._make_layer(128, 4, 2)
        self.layer3 = self._make_layer(256, 6, 2)
        self.layer4 = self._make_layer(512, 3, 2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * 4, 1000)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                _conv1x1(self.inplanes, planes * 4, stride),
                self._norm(planes * 4))
        layers = [_Bottleneck(self.inplanes, planes, stride, downsample,
                              self._norm)]
        self.inplanes = planes * 4
        layers += [_Bottleneck(self.inplanes, planes, norm_layer=self._norm)
                   for _ in range(1, blocks)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(torch.flatten(self.avgpool(x), 1))


def resnet50(weights=None, norm_layer=None, **kwargs):
    del weights  # no zoo in this environment; random init
    return _ResNet50(norm_layer or nn.BatchNorm2d)


class _ILG(nn.ModuleDict):
    """torchvision.models._utils.IntermediateLayerGetter semantics: keep
    children up to the last requested layer, return {out_name: features}."""

    def __init__(self, model, return_layers):
        rl = {str(k): str(v) for k, v in return_layers.items()}
        remaining = set(rl)
        layers = OrderedDict()
        for name, module in model.named_children():
            layers[name] = module
            remaining.discard(name)
            if not remaining:
                break
        super().__init__(layers)
        self.return_layers = rl

    def forward(self, x):
        out = OrderedDict()
        for name, module in self.items():
            x = module(x)
            if name in self.return_layers:
                out[self.return_layers[name]] = x
        return out


def install():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    _utils = types.ModuleType("torchvision.models._utils")
    models.resnet50 = resnet50

    class ResNet50_Weights:
        DEFAULT = None

    models.ResNet50_Weights = ResNet50_Weights
    _utils.IntermediateLayerGetter = _ILG
    models._utils = _utils
    tv.models = models

    ops = types.ModuleType("torchvision.ops")
    boxes_mod = types.ModuleType("torchvision.ops.boxes")

    def box_area(boxes):
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    boxes_mod.box_area = box_area
    ops.boxes = boxes_mod
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models._utils"] = _utils
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.boxes"] = boxes_mod
