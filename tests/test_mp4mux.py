"""Audio-passthrough MP4 remuxer tests.

Fixtures are built with the independent writer from test_gpmf (box/klv) plus
a handcrafted audio track; the result is validated with the ISO-BMFF reader
AND with cv2 (the video stream must stay decodable after the remux).
"""
import struct

import numpy as np
import pytest

from gyroflow_tpu.core.telemetry.mp4 import parse_tracks
from gyroflow_tpu.utils.mp4mux import remux_with_audio

from test_gpmf import box


def full(typ, body, ver=0, flags=0):
    return box(typ, struct.pack(">I", (ver << 24) | flags) + body)


def make_media_mp4(handler: bytes, handler_name: bytes, fmt: bytes,
                   payloads, timescale=48000, sample_dur=1024, track_id=1,
                   stsd_entry=None):
    """Single-track MP4 with real chunk data (one chunk per sample)."""
    sizes = [len(p) for p in payloads]
    if stsd_entry is None:
        stsd_entry = box(fmt, b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 20)
    stsd = full(b"stsd", struct.pack(">I", 1) + stsd_entry)
    stts = full(b"stts", struct.pack(">III", 1, len(payloads), sample_dur))
    stsz = full(b"stsz", struct.pack(">II", 0, len(sizes)) +
                struct.pack(f">{len(sizes)}I", *sizes))
    stsc = full(b"stsc", struct.pack(">I", 1) + struct.pack(">III", 1, 1, 1))
    hdlr = full(b"hdlr", b"\x00" * 4 + handler + b"\x00" * 12 + handler_name + b"\x00")
    mdhd = full(b"mdhd", struct.pack(">IIII", 0, 0, timescale,
                                     sample_dur * len(payloads)) +
                struct.pack(">HH", 0x55C4, 0))
    tkhd = full(b"tkhd", struct.pack(">III", 0, 0, track_id) + b"\x00" * 68, flags=7)
    mvhd = full(b"mvhd", struct.pack(">IIII", 0, 0, 1000, 1000) + b"\x00" * 76 +
                struct.pack(">I", track_id + 1))
    for _ in range(2):
        stco_body = struct.pack(">I", len(sizes)) + b"\x00" * 4 * len(sizes)
        stco = full(b"stco", stco_body)
        stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        trak = box(b"trak", tkhd + mdia)
        moov = box(b"moov", mvhd + trak)
        ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2mp41")
        off = len(ftyp) + len(moov) + 8
        offs = []
        for sz in sizes:
            offs.append(off)
            off += sz
        stco_body = struct.pack(">I", len(sizes)) + struct.pack(f">{len(sizes)}I", *offs)
        stco = full(b"stco", stco_body)
        stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        trak = box(b"trak", tkhd + mdia)
        moov = box(b"moov", mvhd + trak)
    return ftyp + moov + box(b"mdat", b"".join(payloads))


class TestRemux:
    def test_merge_and_chunk_relocation(self, tmp_path):
        vp = [b"VIDEOFRAME%02d" % i for i in range(5)]
        ap = [bytes([0xA0 + i]) * 37 for i in range(8)]
        vfile = tmp_path / "video.mp4"
        afile = tmp_path / "source.mp4"
        ofile = tmp_path / "out.mp4"
        vfile.write_bytes(make_media_mp4(b"vide", b"Video", b"mp4v", vp))
        afile.write_bytes(make_media_mp4(b"soun", b"Sound", b"mp4a", ap, track_id=1))
        assert remux_with_audio(str(vfile), str(afile), str(ofile))

        buf = ofile.read_bytes()
        tracks = parse_tracks(buf)
        assert len(tracks) == 2
        by_type = {t.handler_type: t for t in tracks}
        assert b"vide" in by_type and b"soun" in by_type
        # every sample's bytes must be identical at the relocated offsets
        vsamples = by_type[b"vide"].samples()
        for (off, size, _t, _d), orig in zip(vsamples, vp):
            assert buf[off:off + size] == orig
        asamples = by_type[b"soun"].samples()
        for (off, size, _t, _d), orig in zip(asamples, ap):
            assert buf[off:off + size] == orig

    def test_track_id_deduplicated(self, tmp_path):
        vfile = tmp_path / "v.mp4"; afile = tmp_path / "a.mp4"; ofile = tmp_path / "o.mp4"
        vfile.write_bytes(make_media_mp4(b"vide", b"V", b"mp4v", [b"x" * 10], track_id=1))
        afile.write_bytes(make_media_mp4(b"soun", b"S", b"mp4a", [b"y" * 10], track_id=1))
        assert remux_with_audio(str(vfile), str(afile), str(ofile))
        buf = ofile.read_bytes()
        # collect tkhd track ids
        ids = []
        pos = buf.find(b"tkhd")
        while pos != -1:
            ver = buf[pos + 4]
            ids.append(struct.unpack_from(">I", buf, pos + (24 if ver == 1 else 16))[0])
            pos = buf.find(b"tkhd", pos + 4)
        assert len(ids) == 2 and ids[0] != ids[1], ids

    def test_no_audio_track_returns_false(self, tmp_path):
        vfile = tmp_path / "v.mp4"; ofile = tmp_path / "o.mp4"
        vfile.write_bytes(make_media_mp4(b"vide", b"V", b"mp4v", [b"x" * 10]))
        assert not remux_with_audio(str(vfile), str(vfile), str(ofile))
        assert not ofile.exists()

    def test_cv2_video_survives_remux(self, tmp_path):
        import cv2
        vfile = str(tmp_path / "clip.mp4")
        vw = cv2.VideoWriter(vfile, cv2.VideoWriter_fourcc(*"mp4v"), 24.0, (64, 48))
        rng = np.random.default_rng(0)
        frames = []
        for _ in range(6):
            f = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
            frames.append(f)
            vw.write(f)
        vw.release()
        afile = tmp_path / "src.mp4"
        afile.write_bytes(make_media_mp4(b"soun", b"Sound", b"mp4a",
                                         [b"z" * 41] * 4))
        ofile = str(tmp_path / "merged.mp4")
        assert remux_with_audio(vfile, str(afile), ofile)
        cap = cv2.VideoCapture(ofile)
        n = 0
        while True:
            ok, fr = cap.read()
            if not ok:
                break
            n += 1
        assert n == 6, f"decoded {n} frames after remux"
        tracks = parse_tracks(open(ofile, "rb").read())
        assert {t.handler_type for t in tracks} >= {b"vide", b"soun"}


def make_multitrack_mp4(specs, timescale=48000, sample_dur=1024):
    """Multi-track MP4: specs = [(handler, name, fmt, payloads), ...]."""
    traks = []
    all_sizes = []
    for ti, (handler, handler_name, fmt, payloads) in enumerate(specs):
        sizes = [len(p) for p in payloads]
        all_sizes.append(sizes)
        stsd_entry = box(fmt, b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 20)
        stsd = full(b"stsd", struct.pack(">I", 1) + stsd_entry)
        stts = full(b"stts", struct.pack(">III", 1, len(payloads), sample_dur))
        stsz = full(b"stsz", struct.pack(">II", 0, len(sizes)) +
                    struct.pack(f">{len(sizes)}I", *sizes))
        stsc = full(b"stsc", struct.pack(">I", 1) + struct.pack(">III", 1, 1, 1))
        hdlr = full(b"hdlr", b"\x00" * 4 + handler + b"\x00" * 12 +
                    handler_name + b"\x00")
        mdhd = full(b"mdhd", struct.pack(">IIII", 0, 0, timescale,
                                         sample_dur * len(payloads)) +
                    struct.pack(">HH", 0x55C4, 0))
        tkhd = full(b"tkhd", struct.pack(">III", 0, 0, ti + 1) + b"\x00" * 68,
                    flags=7)
        traks.append((tkhd, mdhd, hdlr, stsd, stts, stsc, stsz, sizes))

    mvhd = full(b"mvhd", struct.pack(">IIII", 0, 0, 1000, 1000) + b"\x00" * 76 +
                struct.pack(">I", len(specs) + 1))
    data_start = 0
    for _pass in range(2):
        trak_boxes = []
        off = data_start
        for (tkhd, mdhd, hdlr, stsd, stts, stsc, stsz, sizes) in traks:
            offs = []
            for sz in sizes:
                offs.append(off)
                off += sz
            stco = full(b"stco", struct.pack(">I", len(sizes)) +
                        struct.pack(f">{len(sizes)}I", *offs))
            stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
            trak_boxes.append(box(b"trak", tkhd + box(
                b"mdia", mdhd + hdlr + box(b"minf", stbl))))
        moov = box(b"moov", mvhd + b"".join(trak_boxes))
        ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2mp41")
        data_start = len(ftyp) + len(moov) + 8
    payload = b"".join(p for spec in specs for p in spec[3])
    return ftyp + moov + box(b"mdat", payload)


class TestPreserveOtherTracks:
    """preserve_other_tracks carries every non-video source trak (GPMF
    telemetry, timecode...) — render_queue.rs:86, ffmpeg_processor.rs:300-346."""

    def test_meta_trak_carried(self, tmp_path):
        vfile = tmp_path / "v.mp4"; sfile = tmp_path / "src.mp4"
        ofile = tmp_path / "o.mp4"
        vfile.write_bytes(make_media_mp4(b"vide", b"V", b"mp4v",
                                         [b"x" * 10] * 3))
        ap = [bytes([0xA0 + i]) * 21 for i in range(4)]
        gp = [b"GPMF%02d" % i for i in range(3)]
        sfile.write_bytes(make_multitrack_mp4([
            (b"soun", b"Sound", b"mp4a", ap),
            (b"meta", b"GoPro MET", b"gpmd", gp)]))
        assert remux_with_audio(str(vfile), str(sfile), str(ofile),
                                preserve_other_tracks=True)
        buf = ofile.read_bytes()
        tracks = parse_tracks(buf)
        by_type = {t.handler_type: t for t in tracks}
        assert set(by_type) == {b"vide", b"soun", b"meta"}
        for (off, size, _t, _d), orig in zip(by_type[b"soun"].samples(), ap):
            assert buf[off:off + size] == orig
        for (off, size, _t, _d), orig in zip(by_type[b"meta"].samples(), gp):
            assert buf[off:off + size] == orig

    def test_default_keeps_only_audio(self, tmp_path):
        vfile = tmp_path / "v.mp4"; sfile = tmp_path / "src.mp4"
        ofile = tmp_path / "o.mp4"
        vfile.write_bytes(make_media_mp4(b"vide", b"V", b"mp4v", [b"x" * 10]))
        sfile.write_bytes(make_multitrack_mp4([
            (b"soun", b"Sound", b"mp4a", [b"a" * 9]),
            (b"meta", b"GoPro MET", b"gpmd", [b"g" * 9])]))
        assert remux_with_audio(str(vfile), str(sfile), str(ofile))
        tracks = parse_tracks(ofile.read_bytes())
        assert {t.handler_type for t in tracks} == {b"vide", b"soun"}

    def test_track_ids_unique(self, tmp_path):
        vfile = tmp_path / "v.mp4"; sfile = tmp_path / "src.mp4"
        ofile = tmp_path / "o.mp4"
        vfile.write_bytes(make_media_mp4(b"vide", b"V", b"mp4v", [b"x" * 10]))
        sfile.write_bytes(make_multitrack_mp4([
            (b"soun", b"S", b"mp4a", [b"a" * 9]),
            (b"meta", b"M", b"gpmd", [b"g" * 9])]))
        assert remux_with_audio(str(vfile), str(sfile), str(ofile),
                                preserve_other_tracks=True)
        buf = ofile.read_bytes()
        ids = []
        pos = buf.find(b"tkhd")
        while pos != -1:
            ver = buf[pos + 4]
            ids.append(struct.unpack_from(">I", buf,
                                          pos + (24 if ver == 1 else 16))[0])
            pos = buf.find(b"tkhd", pos + 4)
        assert len(ids) == 3 and len(set(ids)) == 3, ids


class TestAudioTrim:
    """Trimmed renders present only the rendered range of the source audio
    via an edts/elst edit (rendering/mod.rs:278-279 proc.ranges_ms)."""

    def _parse_elst(self, buf):
        pos = buf.find(b"elst")
        if pos == -1:
            return None
        count = struct.unpack_from(">I", buf, pos + 8)[0]
        entries = [struct.unpack_from(">IiHH", buf, pos + 12 + 12 * i)
                   for i in range(count)]
        return entries

    def test_offset_and_duration_write_elst(self, tmp_path):
        vfile = tmp_path / "v.mp4"; afile = tmp_path / "a.mp4"
        ofile = tmp_path / "o.mp4"
        vfile.write_bytes(make_media_mp4(b"vide", b"V", b"mp4v",
                                         [b"x" * 10] * 5))
        # audio: timescale 48000, 8 samples x 1024 ticks = 8192 (~0.171 s);
        # movie timescale (from the VIDEO file's mvhd) is 1000
        afile.write_bytes(make_media_mp4(b"soun", b"S", b"mp4a",
                                         [bytes([i]) * 37 for i in range(8)]))
        assert remux_with_audio(str(vfile), str(afile), str(ofile),
                                offset_s=0.05, duration_s=0.08)
        buf = ofile.read_bytes()
        entries = self._parse_elst(buf)
        assert entries == [(80, 2400, 1, 0)], entries  # 0.08*1000, 0.05*48000
        # sample data still relocates correctly with the edts inserted
        tracks = parse_tracks(buf)
        soun = next(t for t in tracks if t.handler_type == b"soun")
        for (off, size, _t, _d), i in zip(soun.samples(), range(8)):
            assert buf[off:off + size] == bytes([i]) * 37

    def test_open_ended_duration_uses_media_remainder(self, tmp_path):
        vfile = tmp_path / "v.mp4"; afile = tmp_path / "a.mp4"
        ofile = tmp_path / "o.mp4"
        vfile.write_bytes(make_media_mp4(b"vide", b"V", b"mp4v", [b"x" * 10]))
        afile.write_bytes(make_media_mp4(b"soun", b"S", b"mp4a",
                                         [b"y" * 10] * 8))
        assert remux_with_audio(str(vfile), str(afile), str(ofile),
                                offset_s=0.1)
        entries = self._parse_elst(ofile.read_bytes())
        # remainder = 8192/48000 - 0.1 ≈ 0.0707 s -> 71 movie ticks
        assert entries == [(71, 4800, 1, 0)], entries

    def test_offset_past_audio_end_returns_false(self, tmp_path):
        vfile = tmp_path / "v.mp4"; afile = tmp_path / "a.mp4"
        ofile = tmp_path / "o.mp4"
        vfile.write_bytes(make_media_mp4(b"vide", b"V", b"mp4v", [b"x" * 10]))
        afile.write_bytes(make_media_mp4(b"soun", b"S", b"mp4a", [b"y" * 10]))
        assert not remux_with_audio(str(vfile), str(afile), str(ofile),
                                    offset_s=60.0)
        assert not ofile.exists()

    def test_existing_edit_list_bails(self, tmp_path):
        vfile = tmp_path / "v.mp4"; afile = tmp_path / "a.mp4"
        ofile = tmp_path / "o.mp4"
        vfile.write_bytes(make_media_mp4(b"vide", b"V", b"mp4v", [b"x" * 10]))
        blob = make_media_mp4(b"soun", b"S", b"mp4a", [b"y" * 10] * 2)
        # splice an edts (e.g. AAC priming) after the audio tkhd: composing
        # offsets with an existing edit is ambiguous -> video-only fallback
        elst = full(b"elst", struct.pack(">I", 1) +
                    struct.pack(">IiHH", 100, 0, 1, 0))
        edts = box(b"edts", elst)
        tk = blob.find(b"tkhd")
        tk_end = tk - 4 + struct.unpack_from(">I", blob, tk - 4)[0]
        patched = bytearray(blob[:tk_end] + edts + blob[tk_end:])
        # grow every ancestor box (trak/moov) that contained the splice point
        for name in (b"trak", b"moov"):
            p = patched.find(name)
            struct.pack_into(">I", patched, p - 4,
                             struct.unpack_from(">I", patched, p - 4)[0] + len(edts))
        afile.write_bytes(bytes(patched))
        assert not remux_with_audio(str(vfile), str(afile), str(ofile),
                                    offset_s=0.01)

    def test_untrimmed_remux_has_no_elst(self, tmp_path):
        vfile = tmp_path / "v.mp4"; afile = tmp_path / "a.mp4"
        ofile = tmp_path / "o.mp4"
        vfile.write_bytes(make_media_mp4(b"vide", b"V", b"mp4v", [b"x" * 10]))
        afile.write_bytes(make_media_mp4(b"soun", b"S", b"mp4a", [b"y" * 10]))
        assert remux_with_audio(str(vfile), str(afile), str(ofile))
        assert self._parse_elst(ofile.read_bytes()) is None


class TestPcmRewrite:
    """QuickTime PCM ('sowt' etc.) -> ISO 23003-5 ipcm+pcmC when remuxing
    into .mp4 (VERDICT r2 #6); the ffmpeg path transcodes instead."""

    def _remux(self, tmp_path, out_name):
        vid = make_media_mp4(b"vide", b"Video", b"avc1",
                             [b"\x00\x01\x02\x03"] * 3)
        pcm = np.arange(-500, 500, dtype="<i2").tobytes()
        aud = make_media_mp4(b"soun", b"Sound", b"sowt", [pcm], track_id=2)
        v = tmp_path / "v.mp4"
        a = tmp_path / "a.mov"
        v.write_bytes(vid)
        a.write_bytes(aud)
        out = tmp_path / out_name
        assert remux_with_audio(str(v), str(a), str(out))
        return out.read_bytes(), pcm

    def test_sowt_becomes_ipcm_in_mp4(self, tmp_path):
        buf, pcm = self._remux(tmp_path, "o.mp4")
        assert b"sowt" not in buf
        i = buf.find(b"ipcm")
        assert i > 0
        # pcmC follows inside the grown entry: version/flags 0, LE flag, 16
        j = buf.find(b"pcmC")
        assert j > i
        assert buf[j + 4:j + 10] == b"\x00\x00\x00\x00\x01\x10"
        # the PCM chunk bytes survive at the patched chunk offset
        tracks = parse_tracks(buf)
        aud = [t for t in tracks if t.handler_type == b"soun"][0]
        (off, sz, _t, _d) = list(aud.samples())[0]
        assert buf[off:off + sz] == pcm

    def test_mov_output_keeps_qt_entry(self, tmp_path):
        buf, _ = self._remux(tmp_path, "o.mov")
        assert b"sowt" in buf and b"pcmC" not in buf

    @staticmethod
    def _qt_sound_entry(fmt, version, channels=2, rate=48000, bits=16):
        """QuickTime SoundDescription v0/v1/v2 sample entry."""
        if version in (0, 1):
            body = b"\x00" * 6 + struct.pack(">H", 1)           # dref idx
            body += struct.pack(">HHI", version, 0, 0)          # ver/rev/vendor
            body += struct.pack(">HHHHI", channels, bits, 0, 0, rate << 16)
            if version == 1:
                body += struct.pack(">IIII", 1024, 0, 0, 0)     # per-packet
        else:                                                   # v2
            body = b"\x00" * 6 + struct.pack(">H", 1)
            body += struct.pack(">HHI", 2, 0, 0)
            body += struct.pack(">HHhHI", 3, 16, -2, 0, 65536)
            body += struct.pack(">I", 72)                       # struct size
            body += struct.pack(">d", float(rate))
            body += struct.pack(">IIIIII", channels, 0x7F000000, bits, 0, 0, 0)
        return box(fmt, body)

    def _remux_entry(self, tmp_path, entry, pcm):
        vid = make_media_mp4(b"vide", b"Video", b"avc1",
                             [b"\x00\x01\x02\x03"] * 3)
        aud = make_media_mp4(b"soun", b"Sound", b"sowt", [pcm], track_id=2,
                             stsd_entry=entry)
        v, a = tmp_path / "v.mp4", tmp_path / "a.mov"
        v.write_bytes(vid)
        a.write_bytes(aud)
        out = tmp_path / "o.mp4"
        assert remux_with_audio(str(v), str(a), str(out))
        return out.read_bytes()

    def test_v1_sound_description_canonicalized(self, tmp_path):
        # the normal MOV PCM case: v1 entry with 16 extra per-packet bytes
        # must come out as a plain v0 AudioSampleEntry + pcmC
        pcm = np.arange(-500, 500, dtype="<i2").tobytes()
        entry = self._qt_sound_entry(b"sowt", 1, channels=2, rate=48000)
        buf = self._remux_entry(tmp_path, entry, pcm)
        assert b"sowt" not in buf
        i = buf.find(b"ipcm")
        assert i > 0
        eoff = i - 4
        esize = struct.unpack_from(">I", buf, eoff)[0]
        assert esize == 36 + 14                      # v0 base + pcmC, no v1 tail
        assert struct.unpack_from(">H", buf, eoff + 16)[0] == 0   # version
        assert struct.unpack_from(">H", buf, eoff + 24)[0] == 2   # channels
        assert struct.unpack_from(">I", buf, eoff + 32)[0] >> 16 == 48000
        j = buf.find(b"pcmC")
        assert buf[j + 4:j + 10] == b"\x00\x00\x00\x00\x01\x10"
        tracks = parse_tracks(buf)
        aud = [t for t in tracks if t.handler_type == b"soun"][0]
        (off, sz, _t, _d) = list(aud.samples())[0]
        assert buf[off:off + sz] == pcm              # offsets survive the -2 delta

    def test_v2_sound_description_canonicalized(self, tmp_path):
        pcm = np.arange(0, 1000, dtype="<f4").tobytes()
        entry = self._qt_sound_entry(b"fl32", 2, channels=6, rate=96000, bits=32)
        buf = self._remux_entry(tmp_path, entry, pcm)
        assert b"fl32" not in buf
        i = buf.find(b"fpcm")
        assert i > 0
        eoff = i - 4
        assert struct.unpack_from(">I", buf, eoff)[0] == 36 + 14 + 16
        assert struct.unpack_from(">H", buf, eoff + 24)[0] == 6    # channels
        j = buf.find(b"pcmC")
        assert buf[j + 4:j + 10] == b"\x00\x00\x00\x00\x00\x20"   # BE float 32
        k = buf.find(b"srat")                        # 96 kHz exceeds 16.16
        assert k > j
        assert struct.unpack_from(">I", buf, k + 8)[0] == 96000
        tracks = parse_tracks(buf)
        aud = [t for t in tracks if t.handler_type == b"soun"][0]
        (off, sz, _t, _d) = list(aud.samples())[0]
        assert buf[off:off + sz] == pcm


class TestAudioArgs:
    """ffmpeg audio codec decision (ffmpeg_audio.rs:53-119 semantics)."""

    def test_compat_copy_vs_transcode(self, monkeypatch):
        from gyroflow_tpu.render import ffmpeg_io as fio
        monkeypatch.setattr(fio, "probe_audio_codec", lambda p: "pcm_s16le")
        assert fio.audio_args("out.mp4", "in.mov") == \
            ["-c:a", "aac", "-b:a", "192k", "-af", "aresample=async=1"]
        monkeypatch.setattr(fio, "probe_audio_codec", lambda p: "pcm_s16le")
        assert fio.audio_args("out.mov", "in.mov") == ["-c:a", "copy"]
        monkeypatch.setattr(fio, "probe_audio_codec", lambda p: "aac")
        assert fio.audio_args("out.mp4", "in.mp4") == ["-c:a", "copy"]
        monkeypatch.setattr(fio, "probe_audio_codec", lambda p: "aac")
        assert fio.audio_args("out.webm", "in.mp4")[:2] == ["-c:a", "libopus"]

    def test_explicit_codec_wins(self):
        from gyroflow_tpu.render import ffmpeg_io as fio
        assert fio.audio_args("o.mp4", "i.mov", "PCM (s16le)") == \
            ["-c:a", "pcm_s16le"]
        assert fio.audio_args("o.mp4", "i.mov", "aac") == ["-c:a", "aac"]

    def test_probe_failure_falls_back_to_copy(self, monkeypatch):
        from gyroflow_tpu.render import ffmpeg_io as fio
        def boom(p):
            raise OSError("no ffmpeg")
        monkeypatch.setattr(fio, "probe_audio_codec", boom)
        assert fio.audio_args("o.mp4", "i.mov") == ["-c:a", "copy"]
