# reference sweep point: configs/multi_task_cdnet_debug/multi_task_cdnet_debug_vgg16_adam-lr5e-4_bs16_256x256_300e_monuseg.py
# boundary ring: BoundLabelMake selem_radius=(3, 3) (dilation/erosion sweep)
_base_ = ['../_base_/default_runtime.py']

dataset_type = 'MoNuSegDatasetDebug'
data_root = 'data/monuseg'
train_processes = [
    dict(type='Affine', scale=(0.8, 1.2), shear=5, rotate_degree=(-180, 180), translate_frac=(0, 0.01)),
    dict(type='RandomFlip', prob=0.5, direction='horizontal'),
    dict(type='RandomFlip', prob=0.5, direction='vertical'),
    dict(type='RandomCrop', crop_size=(256, 256)),
    dict(type='Pad', pad_size=(256, 256)),
    dict(type='RandomBlur'),
    dict(type='ColorJitter', hue_delta=8, saturation_range=(0.8, 1.2), brightness_delta=26,
         contrast_range=(0.75, 1.25)),
    dict(type='Normalize'),
    dict(type='BoundLabelMake', edge_id=2, selem_radius=(3, 3)),
    dict(type='DirectionLabelMake'),
    dict(type='Formatting', data_keys=['img'], label_keys=['sem_gt', 'sem_gt_w_bound', 'inst_gt', 'dir_gt', 'point_gt', 'loss_weight_map']),
]
test_processes = [
    dict(type='Normalize'),
    dict(type='Formatting', data_keys=['img'], label_keys=[]),
]

data = dict(
    samples_per_gpu=16,
    workers_per_gpu=8,
    train=dict(type=dataset_type, data_root=data_root, img_dir='imgs',
               ann_dir='imgs', split='train.txt', processes=train_processes),
    val=dict(type=dataset_type, data_root=data_root, img_dir='imgs',
             ann_dir='imgs', split='val.txt', processes=test_processes),
    test=dict(type=dataset_type, data_root=data_root, img_dir='imgs',
              ann_dir='imgs', split='val.txt', processes=test_processes),
)

model = dict(
    type='MultiTaskCDNetDebug',
    num_classes=2,
    train_cfg=dict(num_angles=8, use_regression=False, noau=True, parallel=True, use_twobranch=False, use_distance=False, use_sigmoid=False, use_ac=True, ac_len_weight=1, use_focal=False, use_level=False, use_variance=True, use_tploss=True, tploss_weight=True, tploss_dice=True, dir_weight_map=True),
    test_cfg=dict(mode='split', crop_size=(256, 256), overlap_size=(40, 40),
                  rotate_degrees=[0, 90], flip_directions=['none', 'horizontal', 'vertical', 'diagonal'],
                  radius=3),
)

optimizer = dict(type='Adam', lr=0.0005, weight_decay=0.0005)
lr_config = dict(policy='step', by_epoch=True, step=[200], gamma=0.1,
                 warmup='linear', warmup_iters=100, warmup_ratio=1e-6)
runner = dict(type='EpochBasedRunner', max_epochs=300)
checkpoint_config = dict(by_epoch=True, interval=5, max_keep_ckpts=5)
evaluation = dict(interval=10, custom_intervals=[1], custom_milestones=[290],
                  save_best='mAji', rule='greater')
