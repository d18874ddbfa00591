"""Scene description graph: node descriptors and typed property access.

TPU-native equivalent of /root/reference/src/sdl/scene_node_desc.h:81-257 and
sdl/scene_node_tag.h:11-30. A `SceneNodeDesc` is a parsed, untyped node with an
identifier, a category tag, an implementation-type string, a property map and
optional base-desc inheritance; typed accessors with defaults mirror the
reference's `property_<T>[_or_default]` family.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any, Optional


class SceneNodeTag(enum.Enum):
    ROOT = "__root__"
    INTERNAL = "__internal__"
    CAMERA = "Camera"
    SHAPE = "Shape"
    SURFACE = "Surface"
    LIGHT = "Light"
    TRANSFORM = "Transform"
    FILM = "Film"
    FILTER = "Filter"
    SAMPLER = "Sampler"
    INTEGRATOR = "Integrator"
    LIGHT_SAMPLER = "LightSampler"
    ENVIRONMENT = "Environment"
    TEXTURE = "Texture"
    TEXTURE_MAPPING = "TextureMapping"
    SPECTRUM = "Spectrum"
    MEDIUM = "Medium"
    PHASE_FUNCTION = "PhaseFunction"


_TAG_ALIASES = {}
for _t in SceneNodeTag:
    _TAG_ALIASES[_t.value.lower()] = _t
# Reference accepts a few plural/short forms in the text SDL (scene_node_tag.cpp).
_TAG_ALIASES.update(
    {
        "cam": SceneNodeTag.CAMERA,
        "cameras": SceneNodeTag.CAMERA,
        "shapes": SceneNodeTag.SHAPE,
        "object": SceneNodeTag.SHAPE,
        "objects": SceneNodeTag.SHAPE,
        "surfaces": SceneNodeTag.SURFACE,
        "material": SceneNodeTag.SURFACE,
        "materials": SceneNodeTag.SURFACE,
        "mat": SceneNodeTag.SURFACE,
        "lights": SceneNodeTag.LIGHT,
        "illuminant": SceneNodeTag.LIGHT,
        "illuminants": SceneNodeTag.LIGHT,
        "transforms": SceneNodeTag.TRANSFORM,
        "xform": SceneNodeTag.TRANSFORM,
        "films": SceneNodeTag.FILM,
        "filters": SceneNodeTag.FILTER,
        "samplers": SceneNodeTag.SAMPLER,
        "integrators": SceneNodeTag.INTEGRATOR,
        "lightsamplers": SceneNodeTag.LIGHT_SAMPLER,
        "environments": SceneNodeTag.ENVIRONMENT,
        "env": SceneNodeTag.ENVIRONMENT,
        "textures": SceneNodeTag.TEXTURE,
        "tex": SceneNodeTag.TEXTURE,
        "texturemappings": SceneNodeTag.TEXTURE_MAPPING,
        "spectra": SceneNodeTag.SPECTRUM,
        "media": SceneNodeTag.MEDIUM,
        "phasefunctions": SceneNodeTag.PHASE_FUNCTION,
    }
)


def parse_scene_node_tag(desc: str) -> Optional[SceneNodeTag]:
    return _TAG_ALIASES.get(desc.lower())


class SceneNodeError(RuntimeError):
    pass


@dataclass
class SceneNodeDesc:
    identifier: str
    tag: SceneNodeTag
    impl_type: str = ""
    properties: dict[str, Any] = field(default_factory=dict)
    base: Optional["SceneNodeDesc"] = None
    source: str = "<unknown>"

    @property
    def is_defined(self) -> bool:
        return bool(self.impl_type)

    # --- raw lookup with base-desc inheritance (scene_node_desc.h:180-200) ---
    def _raw(self, name: str):
        if name in self.properties:
            return self.properties[name]
        if self.base is not None:
            return self.base._raw(name)
        return None

    def has_property(self, name: str) -> bool:
        return self._raw(name) is not None

    def _values(self, name, kinds):
        v = self._raw(name)
        if v is None:
            return None
        vals = v if isinstance(v, list) else [v]
        out = []
        for item in vals:
            if not isinstance(item, kinds):
                raise SceneNodeError(
                    f"property '{name}' of node '{self.identifier}' has wrong type "
                    f"(got {type(item).__name__})"
                )
            out.append(item)
        return out

    def _scalar(self, name, kinds, convert):
        vals = self._values(name, kinds)
        if vals is None:
            return None
        if len(vals) != 1:
            raise SceneNodeError(
                f"property '{name}' of node '{self.identifier}' expects a scalar, "
                f"got {len(vals)} values"
            )
        return convert(vals[0])

    def _vector(self, name, n, kinds, convert):
        vals = self._values(name, kinds)
        if vals is None:
            return None
        if len(vals) == 1:  # broadcast scalar, as the reference does
            vals = vals * n
        if len(vals) < n:
            raise SceneNodeError(
                f"property '{name}' of node '{self.identifier}' expects {n} values, "
                f"got {len(vals)}"
            )
        return tuple(convert(v) for v in vals[:n])

    # --- typed accessors ---
    def float(self, name, default=None):
        v = self._scalar(name, (int, float, bool), float)
        return self._ret(name, v, default)

    def int(self, name, default=None):
        v = self._scalar(name, (int, float, bool), lambda x: int(x))
        return self._ret(name, v, default)

    def bool(self, name, default=None):
        v = self._scalar(name, (int, float, bool), bool)
        return self._ret(name, v, default)

    def string(self, name, default=None):
        v = self._scalar(name, (str,), str)
        return self._ret(name, v, default)

    def path(self, name, default=None):
        """Like string(), but resolves a relative INPUT path against the
        directory of the scene source this node was parsed from (the sdl
        path-property semantics — scene files reference meshes/textures
        relative to themselves). Output paths (camera 'file') stay raw."""
        v = self.string(name, default)
        if v is None:
            return v
        from pathlib import Path

        p = Path(v)
        if p.is_absolute() or not self.source or self.source.startswith("<"):
            return v
        return str(Path(self.source).parent / p)

    def float2(self, name, default=None):
        return self._ret(name, self._vector(name, 2, (int, float, bool), float), default)

    def float3(self, name, default=None):
        return self._ret(name, self._vector(name, 3, (int, float, bool), float), default)

    def float4(self, name, default=None):
        return self._ret(name, self._vector(name, 4, (int, float, bool), float), default)

    def int2(self, name, default=None):
        return self._ret(name, self._vector(name, 2, (int, float, bool), int), default)

    def float_list(self, name, default=None):
        v = self._values(name, (int, float, bool))
        return self._ret(name, [float(x) for x in v] if v is not None else None, default)

    def string_list(self, name, default=None):
        return self._ret(name, self._values(name, (str,)), default)

    def node(self, name, default=None):
        v = self._raw(name)
        if v is None:
            return self._ret(name, None, default)
        if isinstance(v, list):
            if len(v) != 1:
                raise SceneNodeError(
                    f"property '{name}' of node '{self.identifier}' expects one node"
                )
            v = v[0]
        if not isinstance(v, SceneNodeDesc):
            raise SceneNodeError(
                f"property '{name}' of node '{self.identifier}' is not a node"
            )
        return v

    def node_list(self, name, default=None):
        v = self._raw(name)
        if v is None:
            return self._ret(name, None, default if default is not None else [])
        vals = v if isinstance(v, list) else [v]
        for item in vals:
            if not isinstance(item, SceneNodeDesc):
                raise SceneNodeError(
                    f"property '{name}' of node '{self.identifier}' is not a node list"
                )
        return list(vals)

    @staticmethod
    def _ret(name, value, default):
        if value is not None:
            return value
        return default
