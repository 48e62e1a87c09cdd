"""Event-file writer tests: TFRecord framing + proto encoding round-trip."""

import json
import os
import struct

from boltzmann_machines_tpu.utils.summary_writer import (SummaryWriter,
                                                         _masked_crc)


def test_scalars_jsonl_and_event_framing(tmp_path):
    logdir = str(tmp_path / 'logs')
    w = SummaryWriter(logdir)
    w.add_scalar('loss', 0.5, 1)
    w.add_scalar('loss', 0.25, 2)
    w.close()

    with open(os.path.join(logdir, 'scalars.jsonl')) as f:
        rows = [json.loads(line) for line in f]
    assert [r['value'] for r in rows] == [0.5, 0.25]
    assert [r['step'] for r in rows] == [1, 2]

    # verify TFRecord framing: every record's length/payload CRCs check out
    event_files = [p for p in os.listdir(logdir) if p.startswith('events.out')]
    assert len(event_files) == 1
    with open(os.path.join(logdir, event_files[0]), 'rb') as f:
        data = f.read()
    pos = 0
    n_records = 0
    while pos < len(data):
        header = data[pos:pos + 8]
        length, = struct.unpack('<Q', header)
        crc_h, = struct.unpack('<I', data[pos + 8:pos + 12])
        assert crc_h == _masked_crc(header)
        payload = data[pos + 12:pos + 12 + length]
        crc_p, = struct.unpack('<I', data[pos + 12 + length:pos + 16 + length])
        assert crc_p == _masked_crc(payload)
        pos += 16 + length
        n_records += 1
    assert n_records == 3  # version event + 2 scalars
    # first record carries the TensorBoard version marker
    assert b'brain.Event:2' in data[:64]
