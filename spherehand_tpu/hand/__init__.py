"""Hand model: assets, forward kinematics, linear blend skinning."""

from spherehand_tpu.hand.assets import HandModel, load_hand_model  # noqa: F401
from spherehand_tpu.hand.kinematics import forward_kinematics  # noqa: F401
from spherehand_tpu.hand.skeleton import skeleton_fk  # noqa: F401
from spherehand_tpu.hand.skinning import (  # noqa: F401
    apply_random_scale,
    inverse_orthographic,
    lbs_keypoints,
    lbs_mesh,
    orthographic_project,
)
