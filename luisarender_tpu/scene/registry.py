"""Plugin registry: category -> impl name -> node class.

TPU-native equivalent of the reference's dynamic-module plugin system
(/root/reference/src/base/scene.cpp:54-131 — `luisa-render-<category>-<impl>`
shared libraries loaded via DynamicModule). On TPU there is no dlopen: plugins
are plain Python classes registered by decorator; importing the package
registers every built-in plugin (see luisarender_tpu/__init__.py).
"""

from __future__ import annotations

from .node import SceneNodeTag

_REGISTRY: dict[SceneNodeTag, dict[str, type]] = {tag: {} for tag in SceneNodeTag}


def register(tag: SceneNodeTag, *names: str):
    """Class decorator registering a node implementation under one or more
    (case-insensitive) impl names, mirroring LUISA_RENDER_MAKE_SCENE_NODE_PLUGIN
    (base/scene_node.h:58-67)."""

    def deco(cls):
        for name in names:
            key = name.lower()
            existing = _REGISTRY[tag].get(key)
            if existing is not None and existing is not cls:
                raise RuntimeError(
                    f"duplicate plugin registration: {tag.value}::{name}"
                )
            _REGISTRY[tag][key] = cls
        cls.scene_node_tag = tag
        cls.impl_names = tuple(n.lower() for n in names)
        return cls

    return deco


def lookup(tag: SceneNodeTag, impl_type: str) -> type:
    cls = _REGISTRY[tag].get(impl_type.lower())
    if cls is None:
        available = sorted(_REGISTRY[tag])
        raise KeyError(
            f"unknown {tag.value} implementation '{impl_type}'; available: {available}"
        )
    return cls


def registered(tag: SceneNodeTag) -> dict[str, type]:
    return dict(_REGISTRY[tag])
