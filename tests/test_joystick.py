"""Physical controller binding tests — synthetic Linux joystick event streams.

Validates parity with the reference's GameController thumbstick mapping
(reference input.swift:62-92) without needing a physical device: events are
packed in the kernel js_event wire format and fed through the same parse path
``poll()`` uses.
"""

import os
import struct

import numpy as np
import pytest

from swift3drenderer_tpu.camera import GamepadState, Input
from swift3drenderer_tpu.joystick import (
    JS_EVENT_AXIS, JS_EVENT_BUTTON, JS_EVENT_INIT, JoystickInput,
    open_joystick,
)

EVT = struct.Struct("<IhBB")


def axis(number, value, init=False):
    t = JS_EVENT_AXIS | (JS_EVENT_INIT if init else 0)
    return EVT.pack(0, value, t, number)


def button(number, value):
    return EVT.pack(0, value, JS_EVENT_BUTTON, number)


def pad():
    return JoystickInput(path=None)


def test_thumbstick_mapping_matches_gamepad_state():
    # Full-right left stick + full-up right stick must reproduce the virtual
    # controller mapping exactly (input.swift:87-91 incl. the x6 mouse scale).
    p = pad()
    p.feed(axis(0, 32767) + axis(4, -32767))  # kernel y is down-positive
    inp = p.update_input(Input())

    ref = GamepadState()
    ref.set_sticks(left=(1.0, 0.0), right=(0.0, 1.0))
    ref_inp = ref.update_input(Input())
    assert inp.left == ref_inp.left == -1.0
    assert inp.right == ref_inp.right == 1.0
    assert inp.mouse == ref_inp.mouse == (0.0, 6.0)

    # Integration: a second frame at the same deflection keeps accumulating.
    inp = p.update_input(inp)
    assert inp.mouse == (0.0, 12.0)


def test_y_axes_flip_and_movement():
    p = pad()
    p.feed(axis(1, -32767))  # stick pushed up (kernel negative) -> move forward
    inp = p.update_input(Input())
    assert inp.up == 1.0 and inp.down == -1.0


def test_deadzone_and_buttons_ignored():
    p = pad()
    p.feed(axis(0, 1000))  # ~3% deflection: inside the 8% deadzone
    assert p.left_stick[0] == 0.0
    p.feed(button(0, 1) + axis(0, 16384))
    inp = p.update_input(Input())
    assert inp.right == pytest.approx(0.5, abs=0.01)


def test_partial_records_buffered():
    p = pad()
    ev = axis(3, 32767)
    p.feed(ev[:5])          # partial record: must not desync the stream
    assert p.right_stick[0] == 0.0
    p.feed(ev[5:] + axis(3, 0))
    assert p.right_stick[0] == 0.0  # second event already recentred it
    p.feed(axis(3, 32767))
    assert p.right_stick[0] == pytest.approx(1.0)


def test_init_events_set_initial_state():
    # The kernel replays current state as INIT-flagged events on open.
    p = pad()
    p.feed(axis(1, 32767, init=True))
    inp = p.update_input(Input())
    assert inp.down == 1.0


def test_unmapped_axes_ignored():
    p = pad()
    p.feed(axis(2, 32767) + axis(7, -32767))  # triggers / hat: unmapped
    assert not p.left_stick.any() and not p.right_stick.any()


def test_poll_reads_device_stream(tmp_path):
    # End-to-end poll() against a real fd: a FIFO stands in for /dev/input/js0.
    fifo = str(tmp_path / "js0")
    os.mkfifo(fifo)
    p = JoystickInput(fifo)  # O_RDONLY|O_NONBLOCK opens without a writer
    try:
        p.poll()  # no writer yet: no events, no blocking, no crash
        wfd = os.open(fifo, os.O_WRONLY)
        os.write(wfd, axis(0, 32767) + axis(4, 32767))
        os.close(wfd)
        p.poll()
        inp = p.update_input(Input())
        assert inp.right == 1.0
        assert inp.mouse == (0.0, -6.0)  # kernel down-positive ry flipped
        p.poll()  # writer gone (EOF): must stay quiet
    finally:
        p.close()


def test_open_joystick_absent_device():
    assert open_joystick("/nonexistent/js99") is None
