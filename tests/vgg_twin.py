"""Deterministic torch VGG16 twin shared by the golden generator and the
criteria tests.

The seeded conv weights are ~59 MB as arrays; storing them in
criteria_losses.npz made every golden regeneration commit a 60 MB blob
(ADVICE r2). Both sides now rebuild them from the same torch seed, so the
golden file carries only the tiny CLIP weights and the scalar goldens.
"""
import numpy as np
import torch
import torch.nn as nn

VGG_SEED = 1
VGG_INIT_STD = 0.05


def build_torch_vgg16():
    """torchvision `features` layout, uninitialized."""
    plan = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512, "M"]
    layers, cin = [], 3
    for c in plan:
        if c == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(cin, c, 3, padding=1))
            layers.append(nn.ReLU(inplace=True))
            cin = c
    m = nn.Module()
    m.features = nn.Sequential(*layers)
    return m


def seeded_vgg16():
    """(torch module, torchvision-style state dict of numpy arrays),
    deterministic from VGG_SEED."""
    tvgg = build_torch_vgg16()
    torch.manual_seed(VGG_SEED)
    for m in tvgg.features:
        if isinstance(m, nn.Conv2d):
            nn.init.normal_(m.weight, std=VGG_INIT_STD)
            nn.init.normal_(m.bias, std=VGG_INIT_STD)
    vgg_sd = {f"features.{i}.{p}": t.detach().numpy()
              for i, m in enumerate(tvgg.features)
              if isinstance(m, nn.Conv2d)
              for p, t in [("weight", m.weight), ("bias", m.bias)]}
    return tvgg.eval(), vgg_sd
