"""Built-in material library.

The reference registers 27 named defaults (Core/scene_parser.cpp:675-708,
definitions Core/material.cpp): 11 measured metals (n, k at ~550nm), 15
dielectrics including subsurface-scattering marble/milk-likes, and a `light`
emitter.  Values here are the same physical/measured constants — data, not
code.

Conventions (Core/material.h:12-15): conductors have extinction > 0; metals
have no diffuse color; dielectric specular should be achromatic.
"""

from __future__ import annotations

from typing import Dict


def default_material_dict(air_refraction_index: float = 1.000293) -> dict:
    """Reference material::get_default_material (Core/material.h:62-77)."""
    return dict(
        diffuse=(0.0, 0.0, 0.0),
        emission=(0.0, 0.0, 0.0),
        specular=(0.0, 0.0, 0.0),
        transparent=0.0,
        roughness=0.0,
        refraction_index=air_refraction_index,
        extinction=0.0,
        absorption=(0.0, 0.0, 0.0),
        reduced_scattering=(0.0, 0.0, 0.0),
        diffuse_texture_id=-1,
        specular_texture_id=-1,
    )


def _metal(specular, n, k, roughness=0.3):
    m = default_material_dict()
    m.update(specular=specular, refraction_index=n, extinction=k, roughness=roughness)
    return m


def _dielectric(diffuse, specular, n, roughness, transparent=0.0,
                absorption=(0.0, 0.0, 0.0), reduced_scattering=(0.0, 0.0, 0.0),
                emission=(0.0, 0.0, 0.0)):
    m = default_material_dict()
    m.update(
        diffuse=diffuse, specular=specular, refraction_index=n,
        roughness=roughness, transparent=transparent, absorption=absorption,
        reduced_scattering=reduced_scattering, emission=emission,
    )
    return m


def builtin_materials() -> Dict[str, dict]:
    """Name -> material dict, matching the reference registry ordering/names."""
    white = (1.0, 1.0, 1.0)
    return {
        # metals (Core/material.cpp:12-243)
        "titanium": _metal((0.542, 0.497, 0.499), 2.2670, 3.0385),
        "chromium": _metal((0.549, 0.556, 0.554), 2.3230, 3.1350),
        "iron": _metal((0.562, 0.556, 0.578), 2.5845, 2.7670),
        "nickel": _metal((0.662, 0.609, 0.526), 1.7290, 2.9435),
        "platinum": _metal((0.673, 0.637, 0.585), 1.3400, 1.0300),
        "copper": _metal((0.955, 0.638, 0.538), 1.2404, 2.3929),
        "palladium": _metal((0.733, 0.697, 0.652), 1.4080, 3.2540),
        "zinc": _metal((0.664, 0.824, 0.850), 0.67767, 4.01220),
        "gold": _metal((1.022, 0.782, 0.344), 0.89863, 2.4584),
        "aluminum": _metal((0.913, 0.922, 0.924), 0.63324, 5.4544),
        "silver": _metal((0.972, 0.960, 0.915), 0.04, 2.6484),
        # dielectrics (Core/material.cpp:245-558)
        "glass": _dielectric(white, (0.045,) * 3, 1.5319, 0.1, transparent=1.0),
        "green_glass": _dielectric(white, (0.045,) * 3, 1.5319, 0.1, transparent=1.0,
                                   absorption=(0.8, 0.01, 0.8)),
        "diamond": _dielectric(white, white, 2.4392, 0.01, transparent=1.0),
        "red": _dielectric((0.87, 0.15, 0.15), white, 1.491, 0.01),
        "green": _dielectric((0.15, 0.87, 0.15), white, 1.491, 0.01),
        "orange": _dielectric((0.93, 0.33, 0.04), white, 1.491, 0.01),
        "purple": _dielectric((0.5, 0.1, 0.9), white, 1.491, 0.01),
        "blue": _dielectric((0.4, 0.6, 0.8), white, 1.491, 0.01),
        "wall_blue": _dielectric((0.4, 0.6, 0.8), (0.0,) * 3, 1.491, 0.01),
        "wall_red": _dielectric((0.87, 0.15, 0.15), (0.0,) * 3, 1.491, 0.01),
        "wall_green": _dielectric((0.15, 0.87, 0.15), (0.0,) * 3, 1.491, 0.01),
        "wall_white": _dielectric(white, (0.0,) * 3, 1.491, 0.01),
        "marble": _dielectric((0.0,) * 3, white, 1.486, 0.01, transparent=1.0,
                              absorption=(0.6, 0.6, 0.6), reduced_scattering=(8.0, 8.0, 8.0)),
        "something_blue": _dielectric((0.0,) * 3, white, 1.333, 0.01, transparent=1.0,
                                      absorption=(0.9, 0.3, 0.02), reduced_scattering=(2.0, 2.0, 2.0)),
        "something_red": _dielectric((0.0,) * 3, white, 1.35, 0.01, transparent=1.0,
                                     absorption=(0.02, 5.1, 5.7), reduced_scattering=(9.0, 9.0, 9.0)),
        # emitter (Core/material.cpp:560-579)
        "light": _dielectric((0.0,) * 3, (0.0,) * 3, 1.000293, 0.01,
                             emission=(13.0, 13.0, 11.0)),
    }
