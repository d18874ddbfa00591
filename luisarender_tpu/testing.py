"""Test scenes: the Cornell box and friends, as JSON-SDL dicts.

Geometry uses the classic Cornell box measurement data (public domain,
cornell.edu); reflectances/emission follow the common PBRT/Bitterli RGB
approximations. This is the PR1 reference config from BASELINE.json
("Cornell box, diffuse-only, 1 area light, megakernel path trace").
"""

from __future__ import annotations


def _quad(p0, p1, p2, p3):
    """Two triangles for a quad, wound p0-p1-p2 / p0-p2-p3."""
    return {
        "impl": "inlinemesh",
        "prop": {
            "positions": [c for p in (p0, p1, p2, p3) for c in p],
            "indices": [0, 1, 2, 0, 2, 3],
        },
    }


WHITE = [0.725, 0.71, 0.68]
RED = [0.63, 0.065, 0.05]
GREEN = [0.14, 0.45, 0.091]
LIGHT_EMISSION = [17.0, 12.0, 4.0]


def cornell_box(resolution=(64, 64), spp=16, depth=5, integrator=None, **int_props):
    """Scene dict for the Cornell box. resolution (w, h)."""
    integrator = integrator or "megapath"
    white = {"impl": "matte", "prop": {"Kd": {"impl": "constant", "prop": {"v": WHITE}}}}
    red = {"impl": "matte", "prop": {"Kd": {"impl": "constant", "prop": {"v": RED}}}}
    green = {"impl": "matte", "prop": {"Kd": {"impl": "constant", "prop": {"v": GREEN}}}}

    def shape(quad, surface, light=None):
        # attach surface/light on the mesh directly
        q = dict(quad)
        prop = dict(q["prop"])
        prop["surface"] = surface
        if light is not None:
            prop["light"] = light
        q["prop"] = prop
        return q

    shapes = [
        # floor
        shape(_quad([552.8, 0, 0], [0, 0, 0], [0, 0, 559.2], [549.6, 0, 559.2]), white),
        # ceiling
        shape(
            _quad([556, 548.8, 0], [556, 548.8, 559.2], [0, 548.8, 559.2], [0, 548.8, 0]),
            white,
        ),
        # back wall
        shape(
            _quad([549.6, 0, 559.2], [0, 0, 559.2], [0, 548.8, 559.2], [556, 548.8, 559.2]),
            white,
        ),
        # right wall (green)
        shape(_quad([0, 0, 559.2], [0, 0, 0], [0, 548.8, 0], [0, 548.8, 559.2]), green),
        # left wall (red)
        shape(
            _quad([552.8, 0, 0], [549.6, 0, 559.2], [556, 548.8, 559.2], [556, 548.8, 0]),
            red,
        ),
        # short block
        shape(
            {
                "impl": "inlinemesh",
                "prop": {
                    "positions": [
                        130.0, 165.0, 65.0, 82.0, 165.0, 225.0, 240.0, 165.0, 272.0,
                        290.0, 165.0, 114.0, 130.0, 0.0, 65.0, 82.0, 0.0, 225.0,
                        240.0, 0.0, 272.0, 290.0, 0.0, 114.0,
                    ],
                    "indices": [
                        0, 1, 2, 0, 2, 3,  # top
                        4, 0, 3, 4, 3, 7,  # front
                        5, 1, 0, 5, 0, 4,  # left
                        6, 2, 1, 6, 1, 5,  # back
                        7, 3, 2, 7, 2, 6,  # right
                    ],
                },
            },
            white,
        ),
        # tall block
        shape(
            {
                "impl": "inlinemesh",
                "prop": {
                    "positions": [
                        423.0, 330.0, 247.0, 265.0, 330.0, 296.0, 314.0, 330.0, 456.0,
                        472.0, 330.0, 406.0, 423.0, 0.0, 247.0, 265.0, 0.0, 296.0,
                        314.0, 0.0, 456.0, 472.0, 0.0, 406.0,
                    ],
                    "indices": [
                        0, 1, 2, 0, 2, 3,
                        4, 0, 3, 4, 3, 7,
                        5, 1, 0, 5, 0, 4,
                        6, 2, 1, 6, 1, 5,
                        7, 3, 2, 7, 2, 6,
                    ],
                },
            },
            white,
        ),
        # light (y slightly below ceiling, normal facing down)
        shape(
            _quad(
                [343.0, 548.0, 227.0],
                [343.0, 548.0, 332.0],
                [213.0, 548.0, 332.0],
                [213.0, 548.0, 227.0],
            ),
            white,
            light={
                "impl": "diffuse",
                "prop": {
                    "emission": {"impl": "constant", "prop": {"v": LIGHT_EMISSION}}
                },
            },
        ),
    ]

    return {
        "render": {
            "cameras": [
                {
                    "impl": "pinhole",
                    "prop": {
                        "fov": 39.3077,
                        "spp": spp,
                        "file": "cornell.exr",
                        "film": {
                            "impl": "color",
                            "prop": {"resolution": list(resolution)},
                        },
                        "filter": {"impl": "box", "prop": {}},
                        "transform": {
                            "impl": "view",
                            "prop": {
                                "origin": [278.0, 273.0, -800.0],
                                "front": [0.0, 0.0, 1.0],
                                "up": [0.0, 1.0, 0.0],
                            },
                        },
                    },
                }
            ],
            "integrator": {
                "impl": integrator,
                "prop": {"depth": depth, **int_props},
            },
            "shapes": shapes,
        }
    }


# ---------------------------------------------------------------------------
# Bedroom-class synthetic benchmark scene: n x n subdivided icospheres
# (Disney) over a checkerboard floor with an area light panel and a constant
# environment. n=5, subdiv=5 -> 512k triangles (BASELINE config #3 probe).
def mesh_heavy(res=(1280, 720), spp=4, depth=5, n=5, subdiv=5, accel="auto",
               textured=False):
    # n*n spheres, each 20*4^subdiv tris: 5x5 x 20480 = 512000 tris
    shapes = []
    # floor + walls: big box
    def quad(p0, p1, p2, p3, surface, light=None):
        prop = {
            "positions": [c for p in (p0, p1, p2, p3) for c in p],
            "indices": [0, 1, 2, 0, 2, 3],
            "surface": surface,
        }
        if light:
            prop["light"] = light
        return {"impl": "inlinemesh", "prop": prop}

    checker = {
        "impl": "checkerboard",
        "prop": {
            "on": {"impl": "constant", "prop": {"v": [0.725, 0.71, 0.68]}},
            "off": {"impl": "constant", "prop": {"v": [0.2, 0.2, 0.25]}},
            "scale": [16.0, 16.0],
        },
    }
    floor_mat = {"impl": "matte", "prop": {"Kd": checker}}
    S = 1000.0
    shapes.append(quad([0, 0, 0], [S, 0, 0], [S, 0, S], [0, 0, S], floor_mat))
    # area light panel up top
    shapes.append(
        quad(
            [350, 600, 350],
            [650, 600, 350],
            [650, 600, 650],
            [350, 600, 650],
            {"impl": "null", "prop": {}},
            light={
                "impl": "diffuse",
                "prop": {"emission": {"impl": "constant", "prop": {"v": [8.0, 7.5, 7.0]}}},
            },
        )
    )

    rough_tex = {"impl": "constant", "prop": {"v": [0.35]}}
    tex_file = None
    if textured:
        # bake a procedural color texture to PNG once (exercises the image
        # atlas + mip + LOD path instead of constant folding)
        import tempfile

        import numpy as np

        from .utils import imageio

        yy, xx = np.meshgrid(np.arange(256), np.arange(256), indexing="ij")
        img = np.stack(
            [
                0.5 + 0.45 * np.sin(xx * 0.11) * np.cos(yy * 0.07),
                0.5 + 0.45 * np.sin((xx + yy) * 0.05),
                0.5 + 0.45 * np.cos(xx * 0.03 - yy * 0.09),
            ],
            axis=-1,
        ).astype(np.float32)
        tex_file = tempfile.mktemp(suffix=".png", prefix="meshheavy_tex_")
        imageio.save_png(tex_file, img)
    for i in range(n):
        for j in range(n):
            color = [0.3 + 0.6 * i / max(n - 1, 1), 0.4, 0.9 - 0.6 * j / max(n - 1, 1)]
            color_tex = {"impl": "constant", "prop": {"v": color}}
            if textured:
                color_tex = {
                    "impl": "image",
                    "prop": {"file": tex_file, "encoding": "linear"},
                }
            mat = {
                "impl": "disney",
                "prop": {
                    "color": color_tex,
                    "metallic": {"impl": "constant", "prop": {"v": [0.5 * ((i + j) % 2)]}},
                    "roughness": rough_tex,
                },
            }
            shapes.append(
                {
                    "impl": "sphere",
                    "prop": {
                        # mesh-pipeline stress scene: keep the icosphere
                        "analytic": False,
                        "subdivision": subdiv,
                        "surface": mat,
                        "transform": {
                            "impl": "srt",
                            "prop": {
                                "scale": [70, 70, 70],
                                "translate": [
                                    150 + 700 * i / max(n - 1, 1),
                                    80,
                                    150 + 700 * j / max(n - 1, 1),
                                ],
                            },
                        },
                    },
                }
            )

    d = {
        "render": {
            "accel": accel,
            "cameras": [
                {
                    "impl": "pinhole",
                    "prop": {
                        "fov": 50.0,
                        "spp": spp,
                        "film": {"impl": "color", "prop": {"resolution": list(res)}},
                        "filter": {"impl": "box", "prop": {}},
                        "transform": {
                            "impl": "view",
                            "prop": {
                                "origin": [500.0, 350.0, -700.0],
                                "front": [0.0, -0.25, 1.0],
                                "up": [0.0, 1.0, 0.0],
                            },
                        },
                    },
                }
            ],
            "integrator": {"impl": "megapath", "prop": {"depth": depth}},
            "environment": {
                "impl": "spherical",
                "prop": {
                    "emission": {"impl": "constant", "prop": {"v": [0.4, 0.5, 0.7]}},
                },
            },
            "shapes": shapes,
        }
    }
    return d
