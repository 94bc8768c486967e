"""Device-resident training cache (data/device_cache.py): batches come from
an on-device gather and training matches the host-loader path exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fixtures import make_hecktor_fixture
from multimodal_tta_tpu.conf import ConfigNode
from multimodal_tta_tpu.core.optim import build_optimizer
from multimodal_tta_tpu.core.train_state import TrainState
from multimodal_tta_tpu.core.trainers.seg_trainer import SegTrainer
from multimodal_tta_tpu.data.device_cache import DeviceCachedLoader
from multimodal_tta_tpu.data.hecktor21 import Hecktor21Dataset
from multimodal_tta_tpu.data.loader import HostLoader
from multimodal_tta_tpu.models import UNet3D
from multimodal_tta_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("devcache")
    manifest = make_hecktor_fixture(
        str(root), shape=(16, 16, 16), centers={"CHUS": 3, "CHUM": 5, "CHGJ": 5}
    )
    return Hecktor21Dataset(
        manifest, "train", target_center="CHUS", val_per_center=1,
        expected_shape=(16, 16, 16), transform=None,
    )


def make_trainer(mesh):
    cfg = ConfigNode(
        {
            "task": {"seed": 3},
            "training": {
                "optimizer": "adam",
                "optimizers": {"adam": {"lr": 1e-3}},
                "criterion": {"sigmoid": True},
            },
        }
    )
    model = UNet3D(in_channels=2, num_classes=1, channels=(2, 4), strides=(2,), num_res_units=1)
    x0 = jnp.zeros((1, 16, 16, 16, 2), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=True)
    tx, _ = build_optimizer(cfg.training, variables["params"])
    trainer = SegTrainer(cfg, mesh=mesh)
    trainer.state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), tx=tx,
    )
    return trainer


def run_epochs(trainer, loader, epochs=2):
    losses = []
    for _ in range(epochs):
        for batch in trainer._wrap_loader(loader):
            m = trainer.run_step(batch)
            if m:
                losses.append(m["loss"])
        m = trainer.flush_step_metrics()
        if m:
            losses.append(m["loss"])
    return losses


class TestDeviceCachedLoader:
    def test_matches_host_loader_training(self, dataset):
        """Same seed, f32 store -> identical batch order and identical losses
        to the HostLoader+prefetch path."""
        mesh = make_mesh(jax.devices()[:4], data=4)
        seed = 11

        t1 = make_trainer(mesh)
        dev_loader = DeviceCachedLoader(
            dataset, batch_size=4, shuffle=True, drop_last=True, seed=seed,
            mesh=mesh, image_dtype=np.float32, label_dtype=np.uint8,
        )
        dev_losses = run_epochs(t1, dev_loader)

        t2 = make_trainer(mesh)
        host_loader = HostLoader(dataset, batch_size=4, shuffle=True, drop_last=True,
                                 seed=seed, num_workers=2)
        host_losses = run_epochs(t2, host_loader)

        assert len(dev_losses) == len(host_losses) > 0
        np.testing.assert_allclose(dev_losses, host_losses, rtol=1e-5, atol=1e-6)

    def test_batches_are_device_resident_and_sharded(self, dataset):
        mesh = make_mesh(jax.devices()[:4], data=4)
        loader = DeviceCachedLoader(dataset, batch_size=4, seed=0, mesh=mesh)
        assert loader.device_resident
        batch = next(iter(loader))
        assert isinstance(batch["image"], jax.Array)
        assert batch["image"].dtype == jnp.float16
        assert batch["label"].dtype == jnp.uint8
        assert batch["_n_valid"] == 4
        # sharded over the data axis: 4 addressable shards of batch 1 each
        shards = batch["image"].addressable_shards
        assert len({s.device for s in shards}) == 4

    def test_epochs_reshuffle(self, dataset):
        loader = DeviceCachedLoader(dataset, batch_size=4, seed=0, mesh=None)
        e0 = [np.asarray(b["image"]).astype(np.float64).sum() for b in loader]
        e1 = [np.asarray(b["image"]).astype(np.float64).sum() for b in loader]
        assert not np.allclose(sorted(e0), [0] * len(e0))
        assert not np.allclose(e0, e1)  # different permutation per epoch

    def test_sharded_store_epoch_coverage_and_locality(self, dataset):
        """shard_store=True: the store shards over the data axis (1/N HBM per
        device), every real sample appears >=1x per epoch, batches train."""
        mesh = make_mesh(jax.devices()[:4], data=4)
        loader = DeviceCachedLoader(
            dataset, batch_size=4, shuffle=True, drop_last=True, seed=5,
            mesh=mesh, image_dtype=np.float32, shard_store=True,
        )
        # store is genuinely sharded: each device holds per_shard rows
        n = len(dataset)
        per_shard = -(-n // 4)
        for s in loader._images.addressable_shards:
            assert s.data.shape[0] == per_shard
        assert len({s.device for s in loader._images.addressable_shards}) == 4

        # an epoch yields batch-sharded device batches covering each shard's
        # rows exactly once (wrap rows re-sample early cases)
        seen = []
        for batch in loader:
            assert batch["_n_valid"] == 4
            shards = batch["image"].addressable_shards
            assert len({s.device for s in shards}) == 4
            seen.append(np.asarray(batch["image"]).astype(np.float64).sum())
        assert len(seen) == len(loader) == per_shard  # bsl = 1
        # a second epoch reshuffles
        seen2 = [np.asarray(b["image"]).astype(np.float64).sum() for b in loader]
        assert not np.allclose(seen, seen2)

        # training steps run on the sharded batches
        t = make_trainer(mesh)
        losses = run_epochs(t, loader, epochs=1)
        assert losses and all(np.isfinite(l) for l in losses)

    def test_sharded_store_requires_drop_last_and_divisibility(self, dataset):
        mesh = make_mesh(jax.devices()[:4], data=4)
        with pytest.raises(ValueError, match="drop_last"):
            DeviceCachedLoader(dataset, batch_size=4, drop_last=False, seed=0,
                               mesh=mesh, shard_store=True)
        with pytest.raises(ValueError, match="divisible"):
            DeviceCachedLoader(dataset, batch_size=3, drop_last=True, seed=0,
                               mesh=mesh, shard_store=True)

    def test_host_aug_transform_rejected(self, dataset, tmp_path):
        from multimodal_tta_tpu.data.transforms import get_seg_transforms

        tf = get_seg_transforms(
            ndim=3, split="train", normalize=False, geom_aug=True, intensity_aug=False,
            mean=[0, 0], std=[1, 1],
        )
        ds = Hecktor21Dataset(
            dataset_manifest(dataset), "train", target_center="CHUS", val_per_center=1,
            expected_shape=(16, 16, 16), transform=tf,
        )
        with pytest.raises(ValueError, match="host-side"):
            DeviceCachedLoader(ds, batch_size=4, seed=0)


def dataset_manifest(ds) -> str:
    # recover the manifest path from the module fixture's rows
    import os

    first = ds._rows[0]
    img_dir = os.path.dirname(first[ds.schema.ct])
    return os.path.join(os.path.dirname(img_dir), "manifest.csv")


def test_prefetch_preserves_existing_n_valid():
    """prefetch_to_device must not overwrite a smaller incoming _n_valid:
    DeviceCachedLoader pads index vectors with DUPLICATE (real-looking) rows,
    so re-deriving validity from the array shape would re-count them (e.g.
    eval_on_train over a device-cached loader)."""
    import numpy as np

    from multimodal_tta_tpu.data.prefetch import prefetch_to_device

    batches = [{"image": np.zeros((4, 2, 2, 2, 1), np.float32), "_n_valid": 3}]
    out = list(prefetch_to_device(iter(batches), None, depth=1))
    assert out[0]["_n_valid"] == 3
