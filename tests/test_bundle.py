"""Archive-bundle download/verify tests (`internal/model/onnx_bundle.go`
capability parity: lock resolution, checksum gate, zip/tar extraction with
path-traversal protection, manifest verification)."""

import hashlib
import io
import json
import os
import tarfile
import zipfile

import pytest

from go_pocket_tts_tpu.model_assets import bundle as bd


def _make_tar_gz(path, files):
    with tarfile.open(path, "w:gz") as tf:
        for name, data in files.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))


def _make_zip(path, files):
    with zipfile.ZipFile(path, "w") as zf:
        for name, data in files.items():
            zf.writestr(name, data)


def _manifest_for(files):
    return json.dumps(
        {
            "files": [
                {"path": name, "sha256": hashlib.sha256(data).hexdigest()}
                for name, data in files.items()
            ]
        }
    ).encode()


@pytest.fixture
def payload():
    files = {"weights/model.bin": b"fake-weights" * 100, "README.txt": b"hello"}
    files["bundle-manifest.json"] = _manifest_for(dict(files))
    return files


@pytest.mark.parametrize("fmt", ["tar", "zip"])
def test_download_bundle_roundtrip(tmp_path, payload, fmt):
    archive = tmp_path / ("b.tar.gz" if fmt == "tar" else "b.zip")
    (_make_tar_gz if fmt == "tar" else _make_zip)(str(archive), payload)
    sha = hashlib.sha256(archive.read_bytes()).hexdigest()
    out = tmp_path / "out"
    verified = bd.download_bundle(
        str(out), bundle_url=f"file://{archive}", sha256=sha, log=lambda m: None
    )
    assert (out / "weights" / "model.bin").read_bytes() == payload["weights/model.bin"]
    assert len(verified) == 2  # manifest-listed files (the manifest itself is not listed)


def test_checksum_mismatch_refuses(tmp_path, payload):
    archive = tmp_path / "b.tar.gz"
    _make_tar_gz(str(archive), payload)
    with pytest.raises(ValueError, match="checksum mismatch"):
        bd.download_bundle(
            str(tmp_path / "out"),
            bundle_url=f"file://{archive}",
            sha256="0" * 64,
            log=lambda m: None,
        )
    assert not (tmp_path / "out" / "weights").exists()  # nothing extracted


def test_lock_resolution_by_id_and_variant(tmp_path, payload):
    archive = tmp_path / "b.zip"
    _make_zip(str(archive), payload)
    sha = hashlib.sha256(archive.read_bytes()).hexdigest()
    lock = tmp_path / "bundles.lock.json"
    lock.write_text(
        json.dumps(
            {
                "bundles": [
                    {"id": "main", "variant": "b6369a24", "url": f"file://{archive}", "sha256": sha}
                ]
            }
        )
    )
    out1 = tmp_path / "o1"
    bd.download_bundle(str(out1), bundle_id="main", lock_file=str(lock), log=lambda m: None)
    assert (out1 / "README.txt").exists()
    out2 = tmp_path / "o2"
    bd.download_bundle(str(out2), variant="b6369a24", lock_file=str(lock), log=lambda m: None)
    assert (out2 / "README.txt").exists()
    with pytest.raises(KeyError):
        bd.download_bundle(
            str(tmp_path / "o3"), bundle_id="nope", lock_file=str(lock), log=lambda m: None
        )


def test_zip_slip_rejected(tmp_path):
    archive = tmp_path / "evil.zip"
    _make_zip(str(archive), {"../evil.txt": b"pwn"})
    with pytest.raises(ValueError, match="escapes"):
        bd.extract_archive(str(archive), str(tmp_path / "out"))
    assert not (tmp_path / "evil.txt").exists()


def test_tar_slip_and_symlink_skipped(tmp_path):
    archive = tmp_path / "evil.tar.gz"
    with tarfile.open(archive, "w:gz") as tf:
        info = tarfile.TarInfo("../../evil.txt")
        data = b"pwn"
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    with pytest.raises(ValueError, match="escapes"):
        bd.extract_archive(str(archive), str(tmp_path / "out"))


def test_manifest_detects_corruption(tmp_path, payload):
    archive = tmp_path / "b.tar.gz"
    _make_tar_gz(str(archive), payload)
    out = tmp_path / "out"
    bd.extract_archive(str(archive), str(out), "tar")
    (out / "weights" / "model.bin").write_bytes(b"tampered")
    with pytest.raises(ValueError, match="checksum mismatch"):
        bd.verify_bundle_dir(str(out))


def test_manifest_detects_missing_file(tmp_path, payload):
    archive = tmp_path / "b.tar.gz"
    _make_tar_gz(str(archive), payload)
    out = tmp_path / "out"
    bd.extract_archive(str(archive), str(out), "tar")
    os.unlink(out / "README.txt")
    with pytest.raises(FileNotFoundError):
        bd.verify_bundle_dir(str(out))


def test_no_manifest_safetensors_sanity(tmp_path):
    from go_pocket_tts_tpu.utils.safetensors import encode_tensors
    import numpy as np

    good = encode_tensors({"x": np.zeros((2, 2), np.float32)})
    archive = tmp_path / "b.zip"
    _make_zip(str(archive), {"m.safetensors": good})
    out = tmp_path / "out"
    bd.extract_archive(str(archive), str(out), "zip")
    assert bd.verify_bundle_dir(str(out))

    bad_out = tmp_path / "bad"
    _make_zip(str(tmp_path / "bad.zip"), {"m.safetensors": b"\xff" * 32})
    bd.extract_archive(str(tmp_path / "bad.zip"), str(bad_out), "zip")
    with pytest.raises(Exception):
        bd.verify_bundle_dir(str(bad_out))


def test_cli_download_bundle(tmp_path, payload, capsys):
    from go_pocket_tts_tpu.cli.main import main

    archive = tmp_path / "b.tar.gz"
    _make_tar_gz(str(archive), payload)
    rc = main(
        [
            "model", "download-bundle",
            "--bundle-url", f"file://{archive}",
            "--out-dir", str(tmp_path / "out"),
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["files"] == 2
