"""Frame-loop orchestration: the reference's `run()` simulation driver
(`source/bem_stokes.cc:5636-5884`), restart machinery (`:5658-5674`),
per-frame output (`output_save_stokes_results` `:5135-5329`) and the offline
`composer` (`:5951-6046`).

A gait is a sequence of mesh files `<base><frame>.<fmt>` sharing one
topology; the per-frame geometry pipeline is

    euler(frame) = R_body . frame_node_positions + rigid_displacements

(reference `compute_euler_vector`, `:2247-2440`).  The simulation advances
the swimmer's rigid state (rotation matrix via quaternions, displacement
integral) frame by frame with Forward-Euler or Heun predictor-corrector time
integration.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from .config import ProblemConfig
from .mesh import read_mesh
from .mesh.factories import add_walls_to_mesh
from .mesh.io_vtu import write_vtu
from .problem import StokesBEMProblem
from .physics.rigid import flatten, unflatten
from .physics.kinematics import (
    rotation_matrix_from_quaternion,
    update_rotation_matrix,
    rigid_pointwise_velocities,
    integrate_displacements,
)


@dataclasses.dataclass
class SwimmerState:
    """Restartable rigid state (reference rotation_matrix +
    rigid_displacements_for_sim + frame counter)."""

    rotation: np.ndarray  # [3, 3]
    displacements: np.ndarray  # [n_map, d] accumulated rigid displacement
    frame: int

    def save(self, path: str):
        np.savez(
            path,
            rotation=self.rotation,
            displacements=self.displacements,
            frame=self.frame,
        )

    @classmethod
    def load(cls, path: str) -> "SwimmerState":
        z = np.load(path)
        return cls(z["rotation"], z["displacements"], int(z["frame"]))


class SwimmerSimulation:
    def __init__(self, cfg: ProblemConfig, output_dir: str = "."):
        self.cfg = cfg
        self.out = output_dir
        os.makedirs(output_dir, exist_ok=True)
        base_mesh = self._read_frame_mesh(0)
        self.mesh = add_walls_to_mesh(base_mesh, cfg)
        self.problem = StokesBEMProblem(self.mesh, cfg)
        self.n_swimmer_vertices = base_mesh.n_vertices
        d = self.problem.dim
        q = np.asarray(cfg.initial_quaternion, dtype=np.float64)
        self.state = SwimmerState(
            rotation=np.asarray(
                rotation_matrix_from_quaternion(jnp.asarray(q / np.linalg.norm(q)))
            ),
            displacements=np.zeros((self.problem.map_space.n_nodes, d)),
            frame=0,
        )
        # body-node mask in map space (walls are never rotated/displaced)
        self.map_body_mask = self.problem.body_node_mask[:, None]
        self.history: list[dict] = []

    # ------------------------------------------------------------------
    def _read_frame_mesh(self, frame: int):
        cfg = self.cfg
        path = (
            f"{cfg.input_grid_path}{cfg.input_grid_base_name}{frame}."
            f"{cfg.input_grid_format}"
        )
        return read_mesh(path, dim=cfg.dim, force_material=0)

    def euler_for_frame(self, frame: int) -> jnp.ndarray:
        """Frame geometry under the current rigid state (reference
        `compute_euler_vector` `:2247-2440`: rotate body nodes by the
        accumulated rotation, add accumulated displacements)."""
        from .fem.geometry import euler_from_mesh

        frame_mesh = add_walls_to_mesh(
            self._read_frame_mesh(frame % self.cfg.n_frames), self.cfg
        )
        euler = euler_from_mesh(
            frame_mesh.vertices, self.problem.map_space, self.problem.manifold
        )
        Rm = self.state.rotation
        rotated = euler @ Rm.T
        euler = np.where(self.map_body_mask > 0, rotated, euler)
        if self.cfg.consider_rigid_displacements:
            euler = euler + self.state.displacements * (self.map_body_mask > 0)
        return jnp.asarray(euler)

    # ------------------------------------------------------------------
    def shape_velocities(self, frame: int, euler_now) -> jnp.ndarray:
        cfg = self.cfg
        if cfg.velocity_type == "Squirmer":
            path = os.path.join(
                cfg.input_grid_path, f"squirming_velocity_{frame}.npy"
            )
            return jnp.asarray(np.load(path)).reshape(-1)
        euler_next = self.euler_for_frame(frame + cfg.delta_frame)
        return self.problem.shape_velocities_fd(euler_now, euler_next)

    def _advance_state(self, rigid_velocities: np.ndarray, N):
        cfg = self.cfg
        d = self.problem.dim
        U = jnp.asarray(rigid_velocities)
        v_full, v_tr = rigid_pointwise_velocities(U, N, d, 1.0)
        if d == 3 and cfg.consider_rigid_rotations:
            omega = U[d : 2 * d]
            self.state.rotation = np.asarray(
                update_rotation_matrix(
                    jnp.asarray(self.state.rotation),
                    omega,
                    cfg.time_step,
                    forward_euler=True,
                )
            )
        if cfg.consider_rigid_displacements:
            self.state.displacements = np.asarray(
                integrate_displacements(
                    jnp.asarray(self.state.displacements),
                    v_tr,
                    cfg.time_step,
                    cfg.rigid_displacement_axes,
                )
            )
        return v_full

    # ------------------------------------------------------------------
    def run(self, start_frame: int = 0, end_frame: int | None = None):
        """The main simulation loop (reference `run` `:5681-5875`)."""
        cfg = self.cfg
        if end_frame is None:
            end_frame = cfg.n_frames
        if cfg.use_previous_state and start_frame > 0:
            self.state = SwimmerState.load(
                os.path.join(self.out, f"state_{start_frame - 1}.npz")
            )
        self.state.frame = start_frame

        from .utils import timers

        run_scope = timers.scope("Run")
        run_scope.__enter__()
        for frame in range(start_frame, end_frame, cfg.delta_frame):
            with timers.scope("BEM Reinitialisation"):
                euler = self.euler_for_frame(frame)
                sdot = self.shape_velocities(frame, euler)
            with timers.scope("Assemble + LAC Solve"):
                res = self.problem.solve_frame(euler, sdot)
            U = res["rigid_velocities"]

            if cfg.time_integration == "Heun":
                # predictor: advance a copy of the state, re-solve at the
                # midpoint geometry, average velocities (reference
                # `:5787-5835` + update_system_state Heun branch)
                saved = SwimmerState(
                    self.state.rotation.copy(),
                    self.state.displacements.copy(),
                    frame,
                )
                self._advance_state(U, jnp.asarray(res["operators"]["N"]))
                euler_pred = self.euler_for_frame(frame + cfg.delta_frame)
                sdot_pred = self.shape_velocities(frame + cfg.delta_frame, euler_pred)
                res_pred = self.problem.solve_frame(euler_pred, sdot_pred)
                self.state = saved
                U = 0.5 * (U + res_pred["rigid_velocities"])

            v_full = self._advance_state(U, jnp.asarray(res["operators"]["N"]))
            total_vel = np.asarray(unflatten(jnp.asarray(sdot), 3)) + np.asarray(
                v_full
            )
            self._save_frame(frame, euler, res, total_vel, U)
            self.history.append(
                dict(frame=frame, rigid_velocities=U.tolist())
            )
        run_scope.__exit__(None, None, None)
        # end-of-run timer summary (reference TimeMonitor::summarize `:5882`)
        print(timers.summary())
        return self.history

    # ------------------------------------------------------------------
    def _save_frame(self, frame, euler, res, total_vel, U):
        d = self.problem.dim
        forces = np.asarray(unflatten(jnp.asarray(res["stokes_forces"]), d))
        np.savez(
            os.path.join(self.out, f"result_{frame}.npz"),
            stokes_forces=forces,
            rigid_velocities=np.asarray(U),
            total_velocities=total_vel,
            euler=np.asarray(euler),
        )
        self.state.frame = frame
        self.state.save(os.path.join(self.out, f"state_{frame}.npz"))
        with open(os.path.join(self.out, "point_velocities.txt"), "a") as f:
            f.write(" ".join(f"{v:.16e}" for v in np.asarray(U)) + "\n")
        if frame % max(1, self.cfg.delta_frame) == 0:
            from .fem.geometry import support_points

            sp = np.asarray(
                support_points(euler, self.problem.map_space, self.problem.fe_space)
            )
            write_vtu(
                os.path.join(self.out, f"stokes_{frame}.vtu"),
                sp,
                self.problem.fe_space.cells_nodes[:, : 4 if d == 3 else 2],
                point_data=dict(
                    forces=forces,
                    total_velocities=total_vel,
                ),
                cell_data=dict(
                    material=self.mesh.material_id.astype(np.float64)
                ),
            )

    # ------------------------------------------------------------------
    def compose(self, start_frame: int, end_frame: int):
        """Offline re-aggregation of per-frame dumps: accumulate rigid
        displacements and write composed VTUs + mean stroke velocity
        (reference `composer` `:5951-6046`)."""
        cfg = self.cfg
        total_disp = np.zeros(3)
        mean_U = np.zeros(self.problem.num_rigid)
        count = 0
        for frame in range(start_frame, end_frame, cfg.delta_frame):
            z = np.load(os.path.join(self.out, f"result_{frame}.npz"))
            U = z["rigid_velocities"]
            mean_U += U
            count += 1
            total_disp += cfg.time_step * U[:3]
            euler = z["euler"] + total_disp[None, :] * (self.map_body_mask > 0)
            write_vtu(
                os.path.join(self.out, f"composed_{frame}.vtu"),
                euler,
                self.problem.map_space.cells_nodes[:, :4],
                point_data=dict(forces=z["stokes_forces"]),
            )
        mean_U /= max(count, 1)
        with open(os.path.join(self.out, "mean_velocities_stroke.txt"), "w") as f:
            f.write(" ".join(f"{v:.16e}" for v in mean_U) + "\n")
        return mean_U
