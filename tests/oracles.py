"""Independent NumPy transliterations of the reference's pure math.

These are the golden oracles the framework's state layer is pinned
against.  Each function re-derives the reference behavior (cited by
file:line) with the same dtypes and operation order, written from the
behavioral spec in SURVEY.md §2 — they are the tests' ground truth, kept
separate from the package so a bug can't hide in shared code.
"""

import numpy as np


def ref_standardize(pcl):
    # reference: traj_ball_renderer.py:190-202
    positions = pcl[:, :3]
    center = np.mean(positions, axis=0)
    scale = np.amax(positions - np.amin(positions, axis=0))
    normalized = ((positions - center) / scale).astype(np.float32)
    if pcl.shape[1] == 6:
        return np.column_stack([normalized, pcl[:, 3:6].astype(np.float32)])
    return normalized


def ref_transform(pcl, flip=True):
    # reference: traj_ball_renderer.py:204-221 / traj_b0.py:62-82 (no flip)
    pcl = np.array(pcl)
    if pcl.shape[1] == 6:
        pos = pcl[:, [2, 0, 1]]
        if flip:
            pos[:, 0] *= -1
        pos[:, 2] += 0.0125
        vel = pcl[:, [5, 3, 4]]
        if flip:
            vel[:, 0] *= -1
        return np.column_stack([pos, vel])
    pcl = pcl[:, [2, 0, 1]]
    if flip:
        pcl[:, 0] *= -1
    pcl[:, 2] += 0.0125
    return pcl


def ref_camera_traj(frame_index, total_frames=220):
    # reference: traj_renderer.py:519-527
    progress = frame_index / max(total_frames - 1, 1)
    return (2.8 - 2.0 * progress, 2.8 - 2.0 * progress, 3.0 - 2.0 * progress)


def ref_camera_two_phase(frame_index, start, mid, final):
    # reference: traj_ball_renderer.py:281-307 / traj_b0.py:84-115
    if frame_index <= 199:
        p = frame_index / 199
        a, b = start, mid
    else:
        p = (frame_index - 199) / 20
        a, b = mid, final
    return tuple(a[i] + (b[i] - a[i]) * p for i in range(3))


def ref_rotation_from_velocity(velocity, translation):
    # reference: traj_renderer.py:159-202
    velocity = np.array(velocity, dtype=np.float64)
    vel_norm = np.linalg.norm(velocity)
    if vel_norm < 1e-6:
        m = np.eye(4)
        m[:3, 3] = translation
        return m.flatten()
    target = velocity / vel_norm
    default = np.array([0.0, 0.0, -1.0])
    dot = np.clip(np.dot(default, target), -1.0, 1.0)
    axis = np.cross(default, target)
    axis_norm = np.linalg.norm(axis)
    if axis_norm < 1e-8:
        if dot > 0.999:
            m = np.eye(4)
            m[:3, 3] = translation
            return m.flatten()
        temp = (np.array([1.0, 0.0, 0.0]) if abs(target[0]) < 0.9
                else np.array([0.0, 1.0, 0.0]))
        axis = np.cross(target, temp)
        axis_norm = np.linalg.norm(axis)
        axis = axis / axis_norm if axis_norm > 1e-8 else np.array([0.0, 1.0, 0.0])
        angle = np.pi
    else:
        axis = axis / axis_norm
        angle = np.arccos(dot)
    ca, sa = np.cos(angle), np.sin(angle)
    k = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    rot = np.eye(3) + sa * k + (1 - ca) * (k @ k)
    m = np.eye(4)
    m[:3, :3] = rot
    m[:3, 3] = translation
    return m.flatten()


def ref_trail_length_scale(schedule, f):
    # reference: traj_ball_renderer.py:119-124, traj_vel_renderer.py:215-224,
    # traj_b0.py:127
    if schedule == "fixed":
        return 1.0
    if schedule == "ball":
        return f / 19.0 if f <= 19 else 1.0
    if f <= 19:
        return f / 19.0
    if f <= 199:
        return 1.0
    return 1.0 - (f - 199) / 20


def ref_velocity_trail(position, velocity, length_scale):
    # reference: traj_ball_renderer.py:130-150 (length + sample points)
    velocity = np.array(velocity, dtype=np.float64)
    vel_norm = np.linalg.norm(velocity)
    vel_normalized = min(vel_norm / 10.0, 1.0)
    trail_length = (0.07 + (0.3 - 0.07) * vel_normalized) * length_scale
    vel_direction = -velocity / vel_norm
    pts = []
    for i in range(20):
        t = (20 - 1 - i) / (20 - 1)
        pts.append(position + vel_direction * trail_length * t)
    pts.append(np.asarray(position, np.float64))
    return np.array(pts)


def ref_droplet_mesh():
    # reference: traj_renderer.py:111-145
    n_segments, n_rings = 20, 16
    base_radius, length = 0.008, 0.035
    vertices, faces = [], []
    for i in range(n_rings + 1):
        theta = np.pi * i / n_rings
        for j in range(n_segments):
            phi = 2 * np.pi * j / n_segments
            if theta <= np.pi / 3:
                r, z_off = base_radius, 0
            else:
                t = (theta - np.pi / 3) / (2 * np.pi / 3)
                r = base_radius * (1 - t) ** 2
                z_off = -length * t * 0.8
            vertices.append([r * np.sin(theta) * np.cos(phi),
                             r * np.sin(theta) * np.sin(phi),
                             r * np.cos(theta) + z_off])
    for i in range(n_rings):
        for j in range(n_segments):
            v0 = i * n_segments + j
            v1 = i * n_segments + (j + 1) % n_segments
            v2 = (i + 1) * n_segments + j
            v3 = (i + 1) * n_segments + (j + 1) % n_segments
            faces.append([v0, v2, v1])
            faces.append([v1, v2, v3])
    return np.array(vertices), np.array(faces)


def ref_catmull_rom_trail(history_positions, position):
    """Full replay of _add_trail_lines geometry (traj_renderer.py:204-375).

    Returns the filtered polyline (list of (3,) float arrays) or None when
    the reference would skip the trail.
    """
    if history_positions is None or len(history_positions) == 0:
        return None
    max_history = min(20, len(history_positions))
    used = history_positions[-max_history:]
    if len(used) < 2:
        return None
    points_array = np.array(used)

    def cr(p0, p1, p2, p3, t):
        t2, t3 = t * t, t * t * t
        return 0.5 * ((2 * p1) + (-p0 + p2) * t
                      + (2 * p0 - 5 * p1 + 4 * p2 - p3) * t2
                      + (-p0 + 3 * p1 - 3 * p2 + p3) * t3)

    n_samples = 20
    if len(used) == 2:
        smooth = [(1 - i / (n_samples - 1)) * points_array[0]
                  + (i / (n_samples - 1)) * points_array[1]
                  for i in range(n_samples)]
    else:
        n_seg = len(used) - 1
        sps = max(2, n_samples // n_seg)
        smooth = []
        for seg in range(n_seg):
            if seg == 0:
                p0 = points_array[0] - (points_array[1] - points_array[0])
                p1, p2, p3 = (points_array[0], points_array[1],
                              points_array[min(2, len(used) - 1)])
            elif seg == n_seg - 1:
                p0 = points_array[max(seg - 1, 0)]
                p1, p2 = points_array[seg], points_array[seg + 1]
                p3 = points_array[seg + 1] + (points_array[seg + 1]
                                              - points_array[seg])
            else:
                p0, p1, p2 = (points_array[seg - 1], points_array[seg],
                              points_array[seg + 1])
                p3 = points_array[min(seg + 2, len(used) - 1)]
            for i in range(sps):
                t = i / (sps - 1) if sps > 1 else 0
                smooth.append(cr(p0, p1, p2, p3, t))
        if len(smooth) > n_samples:
            idx = np.linspace(0, len(smooth) - 1, n_samples).astype(int)
            smooth = [smooth[i] for i in idx]
        while len(smooth) < n_samples:
            smooth.append(smooth[-1])

    trail = [np.asarray(p) for p in smooth] + [np.asarray(position)]
    valid = [p for p in trail
             if p.shape == (3,) and np.all(np.isfinite(p))]
    if len(valid) < 2:
        return None
    filtered = [valid[0]]
    for p in valid[1:]:
        if np.linalg.norm(p - filtered[-1]) > 1e-5:
            filtered.append(p)
    if len(filtered) >= 2 and np.linalg.norm(
            filtered[0] - filtered[-1]) < 1e-5:
        filtered = filtered[:-1]
    if len(filtered) < 2:
        return None
    return filtered
