# UNet-S2D: the space-to-depth-stem performance variant of UNet
# (tiseg_tpu/models/segmentors/unet_s2d.py — no reference analog; selected
# for the headline bench only behind the held-out accuracy gate).
# Same data/schedule/labels as configs/unet/.
_base_ = [
    '../unet/monuseg.py',
    '../_base_/default_runtime.py',
]

runner = dict(type='EpochBasedRunner', max_epochs=300)

evaluation = dict(
    interval=20,
    custom_intervals=[1],
    custom_milestones=[295],
    by_epoch=True,
    metric='all',
    save_best='Aji',
    rule='greater',
)

checkpoint_config = dict(by_epoch=True, interval=5, max_keep_ckpts=5)

optimizer = dict(type='Adam', lr=0.0001, weight_decay=0.0005)
optimizer_config = dict()

lr_config = dict(policy='step', by_epoch=True, step=[200], gamma=0.1, warmup='linear', warmup_iters=100,
                 warmup_ratio=1e-6)

model = dict(
    type='UNetS2D',
    num_classes=2,
    train_cfg=dict(),
    test_cfg=dict(
        mode='split',
        crop_size=(256, 256),
        overlap_size=(40, 40),
        if_ddm=False,
        rotate_degrees=[0, 90],
        flip_directions=['none', 'horizontal', 'vertical', 'diagonal'],
        radius=1,
    ),
)
