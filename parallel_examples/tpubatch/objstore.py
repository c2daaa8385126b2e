"""
Minimal object-store abstraction for the decoupled batch pipeline
(the data plane the reference implements directly against S3 in
parallel_examples/awsbatch/do_prepare.py / do_tile.py / do_stitch.py).

Two backends:

- ``file://<dir>`` — a shared filesystem directory (NFS/Filestore on a
  TPU-VM pool; a tempdir in CI). Always available.
- ``s3://<bucket>/<prefix>`` — S3 via boto3 when installed (the
  reference's data plane); gated, never imported unless used.

Objects are addressed by simple relative keys.
"""

import os
import shutil


class ObjectStore:
    """file:// or s3:// key-value blob store."""

    def __init__(self, url):
        self.url = url.rstrip("/")
        if url.startswith("s3://"):
            import boto3  # gated optional dependency
            rest = url[len("s3://"):]
            self.bucket, _, self.prefix = rest.partition("/")
            self.s3 = boto3.client("s3")
            self.kind = "s3"
        elif url.startswith("file://") or "://" not in url:
            path = url[len("file://"):] if url.startswith("file://") else url
            self.root = os.path.abspath(path)
            os.makedirs(self.root, exist_ok=True)
            self.kind = "file"
        else:
            raise ValueError("unsupported object store url: " + url)

    def _key(self, key):
        return (self.prefix + "/" + key).lstrip("/") if self.kind == "s3" \
            else os.path.join(self.root, key)

    def upload(self, localPath, key):
        if self.kind == "s3":
            self.s3.upload_file(localPath, self.bucket, self._key(key))
        else:
            # Atomic: copy into a temp name first, then rename, so a job
            # killed mid-upload never leaves a partial object that a
            # downstream phase would mistake for a complete one.
            dst = self._key(key)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            tmp = dst + ".uploading.%d" % os.getpid()
            if os.path.isdir(localPath):
                shutil.copytree(localPath, tmp)
            else:
                shutil.copyfile(localPath, tmp)
            if os.path.isdir(dst):
                shutil.rmtree(dst)
            os.replace(tmp, dst)

    def download(self, key, localPath):
        if self.kind == "s3":
            self.s3.download_file(self.bucket, self._key(key), localPath)
        else:
            src = self._key(key)
            if os.path.isdir(src):
                if os.path.exists(localPath):
                    shutil.rmtree(localPath)
                shutil.copytree(src, localPath)
            else:
                shutil.copyfile(src, localPath)
        return localPath

    def delete(self, key):
        if self.kind == "s3":
            self.s3.delete_object(Bucket=self.bucket, Key=self._key(key))
        else:
            p = self._key(key)
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
            elif os.path.exists(p):
                os.remove(p)
