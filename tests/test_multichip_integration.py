"""End-to-end multichip integration: a REAL FLAC file goes host entropy
extraction -> lane tensors sharded over the 8-device virtual mesh ->
device dense decode -> bit-exact PCM (the entropy->dense integration the
round-1 dryrun lacked)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from symphonia_tpu.core.io import MediaSourceStream

from flac_builder import build_flac_file, random_walk


@pytest.mark.skipif("len(jax.devices()) < 8")
class TestShardedFlacDecode:
    def test_real_file_entropy_to_sharded_dense_bit_exact(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from symphonia_tpu import native
        from symphonia_tpu.formats.flac import FlacReader
        from symphonia_tpu.ops import flac_dense
        from symphonia_tpu.parallel.mesh import make_mesh

        # Real(istic) stereo content through the real demuxer + extractor.
        n_frames, bs = 32, 512
        ch = random_walk(bs * n_frames, 16, seed=77, ch=2)
        data = build_flac_file(ch, block_size=bs, stereo_mode="mid_side",
                               kind="lpc", lpc_coefs=[1800, -900, 120],
                               lpc_shift=10)
        reader = FlacReader(MediaSourceStream(data))
        si = reader.stream_info
        reader._ensure_scan()
        buf = reader._buf
        starts = reader._frame_starts
        ends = np.empty(len(starts), np.int64)
        ends[:-1] = starts[1:]
        ends[-1] = len(buf)
        if native.available():
            packed = native.flac_extract(buf, starts, ends - starts, si, bs)
            assert (packed["status"] == 0).all()
        else:
            from symphonia_tpu.codecs.flac import parse_frame

            frames = [parse_frame(p, si) for p in reader.packet_table().data]
            packed = flac_dense.pack_parsed_frames(frames, n_max=bs)

        mesh = make_mesh(jax.devices()[:8], dp=4, tp=2)
        F, C, n_max = packed["F"], packed["C"], packed["n_max"]
        Fp = ((F + 3) // 4) * 4  # frame count must divide over dp

        def pad(a, shape0):
            w = [(0, shape0 - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
            return np.pad(np.asarray(a), w)

        res = pad(packed["res"].reshape(F, C, n_max), Fp).reshape(-1, n_max)
        coefs = pad(packed["coefs"].reshape(F, C, 32), Fp).reshape(-1, 32)
        order = pad(packed["order"].reshape(F, C), Fp).reshape(-1)
        shift = pad(packed["shift"].reshape(F, C), Fp).reshape(-1)
        wasted = pad(packed["wasted"].reshape(F, C), Fp).reshape(-1)
        assign = pad(packed["assign"], Fp)

        lane2 = NamedSharding(mesh, P("dp", None))
        vec = NamedSharding(mesh, P("dp"))
        out_sh = NamedSharding(mesh, P("dp", None, "tp"))

        def _decode(res, coefs, order, shift, wasted, assign):
            x = flac_dense.lpc_reconstruct_batch(res, coefs, order, shift,
                                                 n_max)
            x = flac_dense.apply_wasted_bits(x, wasted)
            return flac_dense.decorrelate_batch(x.reshape(-1, 2, n_max),
                                                assign)

        sharded_decode = jax.jit(
            _decode,
            in_shardings=(lane2, lane2, vec, vec, vec, vec),
            out_shardings=out_sh)
        pcm = np.asarray(sharded_decode(
            jnp.asarray(res), jnp.asarray(coefs), jnp.asarray(order),
            jnp.asarray(shift), jnp.asarray(wasted), jnp.asarray(assign)))
        # Stitch frames back to the stream and compare bit-exactly.
        got = pcm[:F].transpose(1, 0, 2).reshape(C, -1)[:, : bs * n_frames]
        np.testing.assert_array_equal(got, np.stack(ch).astype(np.int32))
