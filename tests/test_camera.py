"""Camera state-machine unit tests (reference updateCamera, render.swift:113-135)."""

import numpy as np

from swift3drenderer_tpu.camera import Camera, Input, KeyboardState, quat_from_to, quat_rotate


def test_initial_matrix_identity():
    cam = Camera()
    np.testing.assert_allclose(cam.matrix, np.eye(3, 4, dtype=np.float32))


def test_wasd_translation():
    cam = Camera()
    cam.update(Input(right=1.0))
    np.testing.assert_allclose(cam.position, [0.1, 0.0, 0.0], atol=1e-6)
    cam.update(Input(up=1.0))  # forward = -z axis direction scaled by (down - up)
    np.testing.assert_allclose(cam.position, [0.1, 0.0, -0.1], atol=1e-6)
    # Shift doubles speed through the input layer (input.swift:78).
    kb = KeyboardState()
    kb.key_event("w", True)
    kb.key_event("shift", True)
    inp = kb.update_input(Input())
    assert inp.up == 2.0


def test_view_matrix_rows():
    cam = Camera()
    cam.update(Input(right=1.0, down=1.0))
    m = cam.matrix
    # Rows are [axis | -dot(axis, position)] (render.swift:131-133).
    np.testing.assert_allclose(m[0, :3], cam.axis_x, atol=1e-7)
    np.testing.assert_allclose(m[2, 3], -np.dot(cam.axis_z, cam.position), atol=1e-6)
    # View matrix maps the camera position to the origin.
    p4 = np.array([*cam.position, 1.0], dtype=np.float32)
    np.testing.assert_allclose(m @ p4, np.zeros(3), atol=1e-6)


def test_quat_from_to():
    a = np.array([0.0, 0.0, 1.0], np.float32)
    b = np.array([1.0, 0.0, 0.0], np.float32)
    q = quat_from_to(a, b)
    np.testing.assert_allclose(quat_rotate(q, a), b, atol=1e-6)
    # Identity rotation.
    q = quat_from_to(a, a)
    np.testing.assert_allclose(quat_rotate(q, b), b, atol=1e-6)


def test_mouse_rotation_matches_reference_formula():
    cam = Camera()
    cam.update(Input(mouse=(50.0, 0.0)))
    # New z axis = normalize((mx_old - mx) x_axis + (my_old - my) y_axis +
    # (100 / rotationSpeed) z_axis) with old axes (render.swift:121-123).
    expect_z = np.array([-50.0, 0.0, 100.0 / 0.3], np.float32)
    expect_z /= np.linalg.norm(expect_z)
    np.testing.assert_allclose(cam.axis_z, expect_z, atol=1e-5)
    # Frame stays orthonormal.
    for a, b in [(cam.axis_x, cam.axis_y), (cam.axis_y, cam.axis_z),
                 (cam.axis_x, cam.axis_z)]:
        assert abs(np.dot(a, b)) < 1e-5
    assert abs(np.linalg.norm(cam.axis_x) - 1) < 1e-5
    # Rotation is incremental: same accumulated mouse -> no further change.
    z_before = cam.axis_z.copy()
    cam.update(Input(mouse=(50.0, 0.0)))
    np.testing.assert_array_equal(cam.axis_z, z_before)


def test_pose_checkpoint_roundtrip():
    cam = Camera()
    cam.update(Input(right=1.0, mouse=(10.0, -5.0)))
    state = cam.pose_state()
    cam2 = Camera()
    cam2.load_pose_state(state)
    np.testing.assert_array_equal(cam.matrix, cam2.matrix)


def test_mouse_capture_gates_input():
    kb = KeyboardState()
    kb.mouse_delta(5.0, 5.0)  # not captured: ignored (input.swift:41-45)
    kb.toggle_capture()
    kb.mouse_delta(3.0, -2.0)
    inp = kb.update_input(Input())
    assert inp.mouse == (3.0, -2.0)
    kb.toggle_capture()
    kb.mouse_delta(100.0, 100.0)
    inp2 = kb.update_input(Input(mouse=inp.mouse))
    assert inp2.mouse == (3.0, -2.0)


def test_gamepad_input_mapping():
    from swift3drenderer_tpu.camera import GamepadState
    gp = GamepadState()
    gp.set_sticks(left=(0.5, 1.0), right=(1.0, -2.0))
    inp = gp.update_input(Input())
    # input.swift:87-90: left/right from stick x (left negated), up/down from y.
    assert inp.right == 0.5 and inp.left == -0.5
    assert inp.up == 1.0 and inp.down == -1.0
    # Right stick integrates into the mouse at 6x (input.swift:91).
    assert inp.mouse == (6.0, -12.0)
    inp = gp.update_input(inp)
    assert inp.mouse == (12.0, -24.0)
