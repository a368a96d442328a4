"""raycore_tpu — a TPU-native ray-triangle intersection engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of
JuliaGeometry/Raycore.jl (see SURVEY.md for the component map). The public
surface mirrors the reference's exported API (reference src/Raycore.jl:90-152)
in Python form: SoA pytrees instead of isbits structs, explicit PRNG keys,
0-based indices, and `sync()` as the jit commit boundary.
"""

from .core.ray import (Ray, RayDifferentials, apply, check_direction,
                       increase_hit, scale_differentials, set_direction)
from .core.bounds import (Bounds2, Bounds3, union, intersect_bounds, overlaps,
                          inside, inside_exclusive, expand, diagonal,
                          surface_area, volume, maximum_extent, corner,
                          corners, lerp, offset, bounding_sphere,
                          intersect_ray, intersect_p, fast_intersect_bbox)
from .core.transforms import (Transformation, Quaternion, translate, scale,
                              rotate, rotate_x, rotate_y, rotate_z, look_at,
                              perspective, has_scale, swaps_handedness, slerp,
                              mat4_to_mat3x4, mat3x4_inverse, mat3x4_identity,
                              transform_point_3x4, transform_direction_3x4)
from .core.triangle import (Triangle, empty_triangle, area, normal,
                            is_degenerate, intersect_triangle,
                            fast_intersect_triangle, safe_invdir,
                            partial_derivatives, normal_derivatives,
                            object_bound, world_bound)
from .core import sampling
from .core.sampling import reflect
from .accel.brute import HitResult, closest_hit_brute, any_hit_brute
from .scene.mesh import (build_triangles, is_degenerate_face, sphere_mesh,
                         box_mesh, plane_mesh, displaced_grid_mesh)

__version__ = "0.1.0"
