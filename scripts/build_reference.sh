#!/usr/bin/env bash
# Build the REFERENCE renderer's CPU static path (no CUDA, no SDL) plus this
# repo's validation driver (scripts/ref_driver.cpp) into build_ref/ref_driver.
#
# The reference sources at /root/reference are compiled UNMODIFIED; SDL is
# never needed because only DynamicCamera touches it (reference
# CMakeLists.txt:124-128 links it globally, but the static path —
# StaticCamera.cpp:32-131 — is SDL-free) and we compile our own main.
set -euo pipefail
cd "$(dirname "$0")/.."
REF=${REF:-/root/reference}
OUT=build_ref
mkdir -p "$OUT"

SRCS=(
  "$REF/src/core/HittableList.cpp"
  "$REF/src/core/Ray.cpp"
  "$REF/src/core/camera/Camera.cpp"
  "$REF/src/core/camera/StaticCamera.cpp"
  "$REF/src/optimization/AABB.cpp"
  "$REF/src/optimization/BVHNode.cpp"
  "$REF/src/scene/materials/DielectricMaterial.cpp"
  "$REF/src/scene/materials/DiffuseLightMaterial.cpp"
  "$REF/src/scene/materials/IsotropicMaterial.cpp"
  "$REF/src/scene/materials/LambertianMaterial.cpp"
  "$REF/src/scene/materials/MetalMaterial.cpp"
  "$REF/src/scene/mediums/ConstantMedium.cpp"
  "$REF/src/scene/objects/Plane.cpp"
  "$REF/src/scene/objects/RotateY.cpp"
  "$REF/src/scene/objects/Sphere.cpp"
  "$REF/src/scene/objects/Translate.cpp"
  "$REF/src/scene/textures/CheckerTexture.cpp"
  "$REF/src/scene/textures/NoiseTexture.cpp"
  "$REF/src/scene/textures/SolidColorTexture.cpp"
  scripts/ref_driver.cpp
)

# Same optimization profile as the reference's own build (CMakeLists.txt:35-62
# -O3 -march=native, C++23).
g++ -std=c++23 -O3 -march=native -I"$REF/src" \
    -o "$OUT/ref_driver" "${SRCS[@]}" -pthread
echo "built $OUT/ref_driver"
