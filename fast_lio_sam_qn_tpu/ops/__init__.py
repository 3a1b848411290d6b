from . import (  # noqa: F401
    fpfh,
    gicp,
    hashgrid,
    ieskf,
    knn,
    linalg3,
    pallas_knn,
    pgo,
    quatro,
    se3,
    surfel_map,
    voxel,
)
