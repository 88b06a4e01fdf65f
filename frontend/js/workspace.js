// Workspace: pannable/zoomable canvas with grid + right-click radial picker.
// Same UX contract as the reference (workspace.js + picker.js): middle/ctrl
// drag pans, right-click opens a radial node picker at the cursor.

import { Context, redrawEdges } from "./graph.js";

export class Workspace {
	static offsetX = 0;
	static offsetY = 0;
	static scale = 1;
	static tools = []; // {name, cb(x, y)}

	static registerTool(name, cb) {
		Workspace.tools.push({ name, cb });
	}

	static init(root) {
		const world = document.getElementById("world");
		const apply = () => {
			world.style.transform =
				`translate(${Workspace.offsetX}px, ${Workspace.offsetY}px) ` +
				`scale(${Workspace.scale})`;
			window.workspaceScale = Workspace.scale;
			root.style.backgroundPosition = `${Workspace.offsetX}px ${Workspace.offsetY}px`;
			root.style.backgroundSize = `${40 * Workspace.scale}px ${40 * Workspace.scale}px`;
		};
		apply();

		root.addEventListener("pointerdown", (ev) => {
			const pannable = ev.button === 1 || (ev.button === 0 && ev.ctrlKey) ||
				(ev.button === 0 && ev.target === root);
			if (!pannable) return;
			if (ev.target === root) Context.clearSelection();
			ev.preventDefault();
			const sx = ev.clientX - Workspace.offsetX;
			const sy = ev.clientY - Workspace.offsetY;
			const move = (mv) => {
				Workspace.offsetX = mv.clientX - sx;
				Workspace.offsetY = mv.clientY - sy;
				apply();
			};
			const up = () => {
				window.removeEventListener("pointermove", move);
				window.removeEventListener("pointerup", up);
			};
			window.addEventListener("pointermove", move);
			window.addEventListener("pointerup", up);
		});

		root.addEventListener("wheel", (ev) => {
			ev.preventDefault();
			const factor = ev.deltaY < 0 ? 1.1 : 1 / 1.1;
			const ns = Math.min(2, Math.max(0.25, Workspace.scale * factor));
			// zoom about the cursor
			Workspace.offsetX = ev.clientX - (ev.clientX - Workspace.offsetX) * (ns / Workspace.scale);
			Workspace.offsetY = ev.clientY - (ev.clientY - Workspace.offsetY) * (ns / Workspace.scale);
			Workspace.scale = ns;
			apply();
			redrawEdges();
		});

		root.addEventListener("contextmenu", (ev) => {
			ev.preventDefault();
			Workspace.openPicker(ev.clientX, ev.clientY);
		});
	}

	static worldCoords(clientX, clientY) {
		return {
			x: (clientX - Workspace.offsetX) / Workspace.scale,
			y: (clientY - Workspace.offsetY) / Workspace.scale,
		};
	}

	static openPicker(cx, cy) {
		document.getElementById("picker")?.remove();
		const n = Workspace.tools.length;
		if (!n) return;
		const picker = document.createElement("div");
		picker.id = "picker";
		picker.style.left = `${cx}px`;
		picker.style.top = `${cy}px`;
		const R = 90;
		Workspace.tools.forEach((tool, i) => {
			const angle = (2 * Math.PI * i) / n - Math.PI / 2;
			const item = document.createElement("button");
			item.className = "picker-item";
			item.textContent = tool.name;
			item.style.left = `${Math.cos(angle) * R}px`;
			item.style.top = `${Math.sin(angle) * R}px`;
			item.addEventListener("click", async () => {
				picker.remove();
				const { x, y } = Workspace.worldCoords(cx, cy);
				await tool.cb(x, y);
			});
			picker.append(item);
		});
		const close = () => {
			picker.remove();
			window.removeEventListener("pointerdown", onDown, true);
		};
		const onDown = (ev) => {
			if (!picker.contains(ev.target)) close();
		};
		window.addEventListener("pointerdown", onDown, true);
		document.body.append(picker);
	}
}
