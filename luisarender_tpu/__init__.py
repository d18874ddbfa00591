"""luisarender_tpu — a TPU-native Monte-Carlo spectral renderer.

A brand-new JAX/XLA/Pallas renderer with the capabilities of LuisaRender
(LuisaGroup/LuisaRender, surveyed in SURVEY.md). The reference's
LuisaCompute-DSL + JIT architecture maps to JAX tracing + XLA compilation;
its bindless/polymorphic resource machinery maps to SoA mega-buffers +
scene-static tag dispatch (see scene/compiler.py).

Top-level API:

    scene = luisarender_tpu.load_scene("cornell.json")
    images = luisarender_tpu.render(scene)          # {file: np array}
"""

from __future__ import annotations

__version__ = "0.1.0"

# Import plugin modules for their registration side effects (the analogue of
# the reference's plugin shared-library discovery, base/scene.cpp:54-96).
from .scene.node import SceneNodeTag  # noqa: F401
from .scene.parser import parse_scene_dict, parse_scene_file  # noqa: F401
from .scene.scene import Scene  # noqa: F401
from .scene.compiler import CompiledScene, compile_scene  # noqa: F401

from .transforms import all as _transforms  # noqa: F401
from .filters import impls as _filters  # noqa: F401
from .films import base as _films  # noqa: F401
from .films import display as _films_display  # noqa: F401
from .samplers import base as _samplers  # noqa: F401
from .samplers import lds as _samplers_lds  # noqa: F401
from .cameras import pinhole as _pinhole  # noqa: F401
from .cameras import impls as _cameras_impls  # noqa: F401
from .shapes import impls as _shapes  # noqa: F401
from .textures import constant as _tex_constant  # noqa: F401
from .textures import image as _tex_image  # noqa: F401
from .textures import procedural as _tex_procedural  # noqa: F401
from .texturemappings import impls as _texmap_impls  # noqa: F401
from .textures import sky as _tex_sky  # noqa: F401
from .shapes import loop_subdiv as _shape_subdiv  # noqa: F401
from .surfaces import matte as _surf_matte  # noqa: F401
from .surfaces import mirror as _surf_mirror  # noqa: F401
from .surfaces import glass as _surf_glass  # noqa: F401
from .surfaces import metal as _surf_metal  # noqa: F401
from .surfaces import plastic as _surf_plastic  # noqa: F401
from .surfaces import null as _surf_null  # noqa: F401
from .surfaces import mix as _surf_mix  # noqa: F401
from .surfaces import disney as _surf_disney  # noqa: F401
from .surfaces import layered as _surf_layered  # noqa: F401
from .lights import diffuse as _light_diffuse  # noqa: F401
from .lightsamplers import uniform as _ls_uniform  # noqa: F401
from .environments import spherical as _env_spherical  # noqa: F401
from .environments import impls as _env_impls  # noqa: F401
from .spectra import srgb as _spec_srgb  # noqa: F401
from .spectra import hero as _spec_hero  # noqa: F401
from .integrators import mega_path as _int_mega  # noqa: F401
from .integrators import wave_path as _int_wave  # noqa: F401
from .integrators import mega_vpt as _int_vpt  # noqa: F401
from .integrators import aux as _int_aux  # noqa: F401
from .integrators import megapm as _int_pm  # noqa: F401
from .integrators import pssmlt as _int_mlt  # noqa: F401
from .integrators import gpt as _int_gpt  # noqa: F401
from .media import base as _media_base  # noqa: F401
from .media import grid as _media_grid  # noqa: F401
from .phasefunctions import hg as _phase_hg  # noqa: F401


def load_scene(path, macros=None) -> Scene:
    """Parse + materialize a scene file (JSON SDL)."""
    return Scene.from_file(path, macros)


def render(scene: Scene, save: bool = False):
    """Compile the scene and run its integrator over all cameras.

    Mirrors apps/cli.cpp:154-185: parse -> Scene::create -> Pipeline::create
    -> render. Returns {camera_output_file: np.ndarray (H, W, 3) linear sRGB}.
    """
    compiled = compile_scene(scene)
    return scene.integrator.render(compiled, save=save)


def render_file(path, macros=None, save: bool = True):
    return render(load_scene(path, macros), save=save)
